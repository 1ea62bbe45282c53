"""Config/CLI surface parity tests (reference main.py:29-53, plt.py:181-234)."""

import pytest

from xview2_tpu.config import Config, parse_args


def test_defaults_match_reference():
    cfg = parse_args(["--type", "pre"])
    assert cfg.exec_mode == "train"
    assert cfg.data == "/data"
    assert cfg.results == "/results"
    assert cfg.gpus == 1
    assert cfg.num_workers == 8
    assert cfg.batch_size == 16
    assert cfg.val_batch_size == 13
    assert cfg.precision == 16
    assert cfg.epochs == 250
    assert cfg.patience == 100
    assert cfg.ckpt is None
    assert cfg.logname == "logs"
    assert cfg.seed == 1
    assert cfg.optimizer == "adamw"
    assert cfg.dmg_model == "siamese"
    assert cfg.encoder == "resnest200"
    assert cfg.loss_str == "focal+dice"
    assert not cfg.use_scheduler
    assert cfg.warmup == 1
    assert cfg.init_lr == 1e-4
    assert cfg.final_lr == 1e-4
    assert cfg.lr == 3e-4
    assert cfg.weight_decay == 0
    assert cfg.momentum == 0.9
    assert cfg.dilation == 1
    for flag in ("tta", "ppm", "aspp", "no_skip", "deep_supervision",
                 "attention", "autoaugment", "interpolate", "dec_interp"):
        assert getattr(cfg, flag) is False


def test_interpolate_override_rule():
    # reference main.py:57-59
    cfg = parse_args(["--type", "pre", "--interpolate", "--deep_supervision", "--dec_interp"])
    assert cfg.interpolate
    assert not cfg.deep_supervision
    assert not cfg.dec_interp


def test_nclass_rules():
    # reference model/unet.py:21-26 + UNetLoc default n_class=2
    assert Config(type="pre").n_class == 2
    assert Config(type="post").n_class == 4
    assert Config(type="post", loss_str="mse").n_class == 1
    assert Config(type="post", loss_str="coral").n_class == 3
    assert Config(type="pre").n_metric_class == 2
    assert Config(type="post").n_metric_class == 5


def test_invalid_choices_rejected():
    with pytest.raises(ValueError):
        Config(type="nope")
    with pytest.raises(ValueError):
        Config(type="pre", encoder="vgg16")
    with pytest.raises(ValueError):
        Config(type="pre", loss_str="focal+nonsense")
    with pytest.raises(ValueError):
        Config(type="pre", dilation=3)


def test_json_roundtrip():
    cfg = Config(type="post", dmg_model="fused", loss_str="coral", ppm=True)
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg == cfg2


def test_eval_tta_override_flag():
    # eval-time TTA decoupling (--eval_tta): auto follows the checkpoint's
    # --tta (reference Model.load_from_checkpoint), on/off force it
    from xview2_tpu.config import parse_args
    assert Config(type="pre").eval_tta == "auto"
    assert parse_args(["--type", "pre", "--data", "d", "--eval_tta", "on"]).eval_tta == "on"
    with pytest.raises(ValueError):
        Config(type="pre", eval_tta="sometimes")
    saved = Config(type="post", tta=False)
    for mode, want in (("auto", False), ("on", True), ("off", False)):
        assert {"auto": saved.tta, "on": True, "off": False}[mode] is want
