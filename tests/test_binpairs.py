"""InsightFace verification .bin importer (data/binpairs.py).

Fixtures are synthesized pickles in the published (bins, issame_list)
layout — bytes entries, uint8-array entries, and a PNG to exercise the
transcode path — no mxnet/insightface needed.
"""

import io
import pickle

import numpy as np
import pytest

from tf_face_toolbox_tpu.data.binpairs import (
    convert_bin_to_faceshard,
    load_bin,
)


def _image_bytes(seed: int, fmt: str = "JPEG") -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, fmt, **(
        {"quality": 95} if fmt == "JPEG" else {}))
    return buf.getvalue()


def _write_bin(tmp_path, n_pairs=4, as_array_every=2, png_at=None,
               name="val.bin"):
    """Pair i = images (2i, 2i+1); even pairs same-labeled. Entries
    alternate bytes / 1-D uint8 arrays like wild repackagings do."""
    bins, issame = [], []
    for i in range(n_pairs):
        for j in range(2):
            k = 2 * i + j
            fmt = "PNG" if png_at == k else "JPEG"
            blob = _image_bytes(k, fmt)
            bins.append(np.frombuffer(blob, np.uint8)
                        if k % as_array_every == 0 else blob)
        issame.append(i % 2 == 0)
    path = tmp_path / name
    with open(path, "wb") as f:
        pickle.dump((bins, issame), f, protocol=2)
    return str(path), bins, issame


def test_load_bin_both_entry_encodings(tmp_path):
    path, bins, issame = _write_bin(tmp_path)
    blobs, same = load_bin(path)
    assert len(blobs) == 8 and same.tolist() == [True, False, True, False]
    for got, src in zip(blobs, bins):
        raw = src.tobytes() if isinstance(src, np.ndarray) else src
        assert got == raw


def test_load_bin_rejects_wrong_shape(tmp_path):
    p = tmp_path / "bad.bin"
    with open(p, "wb") as f:
        pickle.dump(([b"one"], [True, False]), f, protocol=2)
    with pytest.raises(ValueError, match="two images per pair"):
        load_bin(str(p))


def test_unpickler_rejects_code_execution(tmp_path):
    """A malicious 'benchmark' that pickles os.system must be refused
    before any reduce runs."""
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    p = tmp_path / "evil.bin"
    with open(p, "wb") as f:
        pickle.dump(([Evil()], [True]), f, protocol=2)
    with pytest.raises(pickle.UnpicklingError, match="not trusted"):
        load_bin(str(p))


def test_convert_writes_shard_and_pairs(tmp_path):
    from tf_face_toolbox_tpu.data.format import ShardReader, read_index

    path, bins, issame = _write_bin(tmp_path)
    out = str(tmp_path / "val.faceshard")
    n, pairs, transcoded = convert_bin_to_faceshard(path, out)
    assert (n, pairs, transcoded) == (8, 4, 0)

    reader = ShardReader(read_index(out))
    assert reader.index.count == 8
    for i in range(8):
        src = bins[i]
        raw = src.tobytes() if isinstance(src, np.ndarray) else src
        assert reader.blob(i) == raw          # JPEGs land verbatim
        assert reader.label(i) == i

    from tf_face_toolbox_tpu.cli.eval_lfw import load_pairs
    i1, i2, lab = load_pairs(out + ".pairs.txt")
    assert i1.tolist() == [0, 2, 4, 6]
    assert i2.tolist() == [1, 3, 5, 7]
    assert lab.tolist() == [1, 0, 1, 0]


def test_convert_transcodes_png(tmp_path):
    from tf_face_toolbox_tpu.data.format import ShardReader, read_index

    path, _, _ = _write_bin(tmp_path, png_at=3)
    out = str(tmp_path / "val.faceshard")
    n, pairs, transcoded = convert_bin_to_faceshard(path, out)
    assert (n, pairs, transcoded) == (8, 4, 1)
    reader = ShardReader(read_index(out))
    for i in range(8):
        assert reader.blob(i)[:2] == b"\xff\xd8"   # all JPEG now


def test_imported_bin_runs_the_eval_chain(tmp_path):
    """End-to-end: .bin → shard+pairs → extract → verify_pairs, the
    exact chain the CLI docstring promises."""
    import jax
    import jax.numpy as jnp

    from tf_face_toolbox_tpu.data.pipeline import (
        FaceShardSource,
        batch_iterator,
    )
    from tf_face_toolbox_tpu.extract import flip_averaged_embeddings
    from tf_face_toolbox_tpu.models import create_network, init_variables
    from tf_face_toolbox_tpu.ops.preprocess import preprocess_eval
    from tf_face_toolbox_tpu.ops.verification import verify_pairs
    from tf_face_toolbox_tpu.cli.eval_lfw import load_pairs

    path, _, _ = _write_bin(tmp_path, n_pairs=4)
    out = str(tmp_path / "val.faceshard")
    convert_bin_to_faceshard(path, out)

    net = create_network("resnet_tiny", embedding_dim=16)
    variables = init_variables(net, jax.random.key(0), (1, 12, 12, 3))

    src = FaceShardSource(out)
    batch = next(batch_iterator(src, 8, num_threads=1))
    images = preprocess_eval(jnp.asarray(batch["image"]), 12, 12)
    emb = np.asarray(flip_averaged_embeddings(
        lambda v, x: net.apply(v, x, train=False), variables, images))
    assert emb.shape == (8, 16)

    i1, i2, labels = load_pairs(out + ".pairs.txt")
    report = verify_pairs(emb[i1], emb[i2], labels, n_folds=2)
    assert 0.0 <= report["accuracy_mean"] <= 1.0
