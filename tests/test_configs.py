"""The five BASELINE.json milestone configs exist and construct."""

import pytest

from tf_face_toolbox_tpu.configs import get_config, list_configs
from tf_face_toolbox_tpu.models import list_networks
from tf_face_toolbox_tpu.train.trainer import TrainConfig


def test_all_five_present():
    assert len(list_configs()) == 5


def test_train_configs_valid():
    for name in ["casia_single_chip", "v5e8_data_parallel"]:
        cfg = get_config(name)
        assert isinstance(cfg, TrainConfig)
        assert cfg.network in list_networks()
        assert cfg.num_classes == 10_572
        assert cfg.margin_m3 == 0.35


def test_eval_configs_reference_known_networks():
    assert get_config("extract_verify_cpu")["network"] in list_networks()
    assert get_config("se_resnet_extract")["network"] in list_networks()
    for n in get_config("variant_backbones")["networks"]:
        assert n in list_networks()


def test_unknown_config_raises():
    with pytest.raises(ValueError):
        get_config("nope")
