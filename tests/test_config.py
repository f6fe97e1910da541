"""Config system: HM-style .cfg parsing + GNU CLI (program_options_lite
parity — program_options_lite.{h,cpp}, TAppEncCfg registry)."""

import glob
import os

import pytest

from hm16_2_tpu.config.options import Options
from hm16_2_tpu.tools.encode import build_options

HM_CFG_DIR = "/tmp/hmref/cfg"


def test_cfg_line_forms(tmp_path):
    o = Options()
    o.add("QP", 32.0, short="q")
    o.add("InputFile", "", short="i")
    o.add("SAO", True)
    o.add("Ratios", [1], multi=True)
    cfg = tmp_path / "t.cfg"
    cfg.write_text(
        "QP : 27            # comment\n"
        "InputFile: foo.yuv\n"
        "# full-line comment\n"
        "\n"
        "SAO: 0\n"
        "Ratios: 1 2 3\n")
    o.parse_config_file(str(cfg))
    assert o["QP"] == 27.0
    assert o["InputFile"] == "foo.yuv"
    assert o["SAO"] is False
    assert o["Ratios"] == [1, 2, 3]


def test_cli_forms(tmp_path):
    o = Options()
    o.add("QP", 32.0, short="q")
    o.add("Width", 0, short="wdt")
    o.add("Flag", False)
    cfg = tmp_path / "a.cfg"
    cfg.write_text("QP: 22\n")
    rest = o.parse_cli(["-c", str(cfg), "--Width=416", "--Flag",
                        "-q", "37", "positional.yuv"])
    assert o["QP"] == 37.0          # CLI after -c wins
    assert o["Width"] == 416
    assert o["Flag"] is True
    assert rest == ["positional.yuv"]


def test_unknown_cli_raises():
    o = Options()
    o.add("QP", 32.0)
    with pytest.raises(ValueError):
        o.parse_cli(["--NoSuchOption=1"])


@pytest.mark.skipif(not os.path.isdir(HM_CFG_DIR), reason="HM cfgs absent")
def test_reference_ctc_cfgs_parse_clean():
    """Every top-level JCT-VC common-test-condition cfg file must parse
    without unknown-option warnings."""
    cfgs = glob.glob(os.path.join(HM_CFG_DIR, "encoder_*.cfg"))
    assert cfgs
    for cfg in cfgs:
        o = build_options()
        o.parse_config_file(cfg)
        assert not o.warnings, (cfg, o.warnings)


@pytest.mark.skipif(not os.path.isdir(HM_CFG_DIR), reason="HM cfgs absent")
def test_per_sequence_cfgs_parse():
    """Per-sequence source descriptors drive the encode geometry."""
    cfg = os.path.join(HM_CFG_DIR, "per-sequence", "BasketballDrill.cfg")
    if not os.path.exists(cfg):
        pytest.skip("per-sequence cfgs absent")
    o = build_options()
    o.parse_config_file(cfg)
    assert o["SourceWidth"] == 832 and o["SourceHeight"] == 480
    assert o["FrameRate"] == 50
