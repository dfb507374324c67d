"""Official LFW pairs.txt parsing (drop-in parity with the reference's
eval artifacts — SURVEY.md §3.3 protocol)."""

import numpy as np

from tf_face_toolbox_tpu.cli.eval_lfw import (
    _is_official_lfw,
    load_lfw_pairs,
    load_pairs,
)

OFFICIAL = """10\t300
Abel_Pacheco\t1\t4
Ann_Veneman\t3\t5
AJ_Cook\t1\tMarsha_Thomason\t1
Abel_Pacheco\t4\tAnn_Veneman\t3
"""

NAMES = """lfw/Abel_Pacheco/Abel_Pacheco_0001.jpg 0
lfw/Abel_Pacheco/Abel_Pacheco_0004.jpg 0
lfw/AJ_Cook/AJ_Cook_0001.jpg 1
lfw/Ann_Veneman/Ann_Veneman_0003.jpg 2
lfw/Ann_Veneman/Ann_Veneman_0005.jpg 2
lfw/Marsha_Thomason/Marsha_Thomason_0001.jpg 3
"""


def test_official_format_detected(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text(OFFICIAL)
    assert _is_official_lfw(str(p))
    q = tmp_path / "idx.txt"
    q.write_text("0 1 1\n2 3 0\n")
    assert not _is_official_lfw(str(q))


def test_commented_index_file_not_misdetected(tmp_path):
    """A 3/4-token comment or annotation line must not flip an
    index-format file into the official-LFW branch (regression: the
    detector used to fire on ANY non-numeric first token while
    load_pairs skipped the same line)."""
    q = tmp_path / "idx.txt"
    q.write_text("# idx1 idx2 label\n0 1 1\nnote: holdout fold\n2 3 0\n")
    assert not _is_official_lfw(str(q))
    i1, i2, lab = load_pairs(str(q))
    np.testing.assert_array_equal(i1, [0, 2])
    np.testing.assert_array_equal(lab, [1, 0])


def test_official_loader_skips_comment_lines(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("# name n1 n2\n" + OFFICIAL)
    n = tmp_path / "list.txt"
    n.write_text(NAMES)
    i1, i2, lab = load_lfw_pairs(str(p), str(n))
    np.testing.assert_array_equal(lab, [1, 1, 0, 0])


def test_official_pairs_resolve_to_rows(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text(OFFICIAL)
    n = tmp_path / "list.txt"
    n.write_text(NAMES)
    i1, i2, lab = load_lfw_pairs(str(p), str(n))
    # matched: Abel 1-4 → rows 0,1 ; Ann 3-5 → rows 3,4
    # mismatched: AJ_1 vs Marsha_1 → 2,5 ; Abel_4 vs Ann_3 → 1,3
    np.testing.assert_array_equal(i1, [0, 3, 2, 1])
    np.testing.assert_array_equal(i2, [1, 4, 5, 3])
    np.testing.assert_array_equal(lab, [1, 1, 0, 0])


def test_missing_photo_raises(tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("Nobody\t1\t2\n")
    n = tmp_path / "list.txt"
    n.write_text(NAMES)
    import pytest

    with pytest.raises(KeyError, match="Nobody_0001"):
        load_lfw_pairs(str(p), str(n))


def test_index_format_unchanged(tmp_path):
    q = tmp_path / "idx.txt"
    q.write_text("0 1 1\n2 3 0\nnot a pair line\n")
    i1, i2, lab = load_pairs(str(q))
    np.testing.assert_array_equal(i1, [0, 2])
    np.testing.assert_array_equal(lab, [1, 0])
