"""HT-RExt encoder tool set (BASELINE config 4 territory): residual
rotation, implicit RDPCM, single-significance-map context, persistent
Golomb-Rice adaptation, CABAC bypass alignment, HT-RExt profile
signalling (encoder_intra_high_throughput_rext.cfg; SPS/PPS range
extensions 7.3.2.2.2/7.3.2.3.2)."""

import os
import subprocess

import numpy as np
import pytest

from hm16_2_tpu.decode.top import Decoder
from hm16_2_tpu.encode.top import Encoder, EncoderConfig

HM_DEC = "/tmp/hmref/bin/TAppDecoderStatic"


def _screen_planes(w, h, bd, cf, seed=5):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = np.where(rng.random((h, w)) < 0.5, mx // 4, 3 * mx // 4) \
        .astype(np.int32)
    y[:, :64] = (yy[:, :64] * 8) % (mx + 1)          # exact vertical ramp
    y[64:, 64:128] = (xx[64:, 64:128] * 8) % (mx + 1)
    u = ((xx * 3) % (mx + 1)).astype(np.int32)
    v = ((yy * 5) % (mx + 1)).astype(np.int32)
    if cf == 1:
        u, v = u[::2, ::2].copy(), v[::2, ::2].copy()
    elif cf == 2:
        u, v = u[:, ::2].copy(), v[:, ::2].copy()
    return [y, u, v]


@pytest.mark.parametrize("bd,cf", [(10, 3), (8, 3), (10, 1), (8, 2)])
def test_rext_tools_selfdecode(bd, cf):
    w, h = 192, 128
    enc = Encoder(EncoderConfig(w, h, qp=30, intra_period=1,
                                chroma_format=cf, bit_depth=bd,
                                transform_skip=True, rext_tools=True))
    au = enc.encode_frame(_screen_planes(w, h, bd, cf), 0)
    assert Decoder().decode_stream(au)[0].hash_ok


def test_rext_lossless_rdpcm_rotation():
    """Transquant bypass + rext tools: every 4x4 intra TU rotates its
    residual, hor/ver-mode TUs code implicit-RDPCM differences, and the
    single-significance context / rice adaptation / bypass alignment
    drive the residual syntax.  Reconstruction must be lossless."""
    w, h = 192, 128
    pl = _screen_planes(w, h, 8, 3)
    enc = Encoder(EncoderConfig(w, h, qp=27, intra_period=1,
                                chroma_format=3, transquant_bypass=True,
                                rext_tools=True))
    au = enc.encode_frame(pl, 0)
    pics = Decoder().decode_stream(au)
    assert pics[0].hash_ok
    for c in range(3):
        assert np.array_equal(pics[0].planes[c], pl[c]), c


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
@pytest.mark.parametrize("kw", [
    dict(chroma_format=3, bit_depth=10, transform_skip=True),
    dict(chroma_format=3, transquant_bypass=True),
    dict(chroma_format=2, bit_depth=10, transform_skip=True),
])
def test_rext_tools_reference_decode(tmp_path, kw):
    w, h = 192, 128
    bd = kw.get("bit_depth", 8)
    cf = kw["chroma_format"]
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=1,
                                rext_tools=True, **kw))
    au = enc.encode_frame(_screen_planes(w, h, bd, cf), 0)
    assert Decoder().decode_stream(au)[0].hash_ok
    f = tmp_path / "rext.bin"
    f.write_bytes(au)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_rext_cfg_cli(tmp_path):
    """Drive the CLI with the in-repo HT-RExt cfg fixture (mirrors
    /root/reference cfg/encoder_intra_high_throughput_rext.cfg keys)."""
    import sys
    w, h, bd = 192, 128, 10
    pl = _screen_planes(w, h, bd, 3)
    src = tmp_path / "s444.yuv"
    with open(src, "wb") as f:
        for p in pl:
            f.write(p.astype("<u2").tobytes())
    cfgf = os.path.join(os.path.dirname(__file__), "..", "cfg",
                        "encoder_intra_high_throughput_rext.cfg")
    b = tmp_path / "ht.bin"
    r = subprocess.run(
        [sys.executable, "-m", "hm16_2_tpu.tools.encode", "-c", cfgf,
         "-i", str(src), "-wdt", str(w), "-hgt", str(h), "-fr", "30",
         "-f", "1", "-q", "32", "--InputBitDepth=10",
         "--InputChromaFormat=444", "-b", str(b), "-o", "/dev/null"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 PYTHONPATH=os.path.join(os.path.dirname(__file__), "..")))
    assert r.returncode == 0, r.stderr[-800:]
    out = subprocess.run([HM_DEC, "-b", str(b), "-o", "/dev/null"],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout


@pytest.mark.parametrize("kw", [
    dict(), dict(transform_skip=True, rext_tools=True),
    dict(transquant_bypass=True),
    dict(transquant_bypass=True, rext_tools=True),
])
def test_ccp_selfdecode(kw):
    """Cross-component prediction (4:4:4): per-TU alpha search on the
    reconstructed luma residual, emission and recon (TComTrQuant.cpp:3290
    crossComponentPrediction; TEncSearch.cpp:1910 alpha estimation)."""
    w, h = 192, 128
    rng = np.random.default_rng(5)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (rng.integers(0, 64, (h, w)) + yy + xx).astype(np.int32)
    y = np.clip(base, 0, 255)
    u = np.clip(200 - (base // 2), 0, 255).astype(np.int32)
    v = np.clip(base // 2 + 30, 0, 255).astype(np.int32)
    enc = Encoder(EncoderConfig(w, h, qp=27, intra_period=1,
                                chroma_format=3,
                                cross_component_prediction=True, **kw))
    au = enc.encode_frame([y, u, v], 0)
    pics = Decoder().decode_stream(au)
    assert pics[0].hash_ok
    if kw.get("transquant_bypass"):
        for c, pl in enumerate((y, u, v)):
            assert np.array_equal(pics[0].planes[c], pl), c


@pytest.mark.skipif(not os.path.exists(HM_DEC), reason="reference decoder absent")
def test_ccp_reference_decode(tmp_path):
    """HM decodes our CCP stream (OK) — covers the luma-only strong
    intra smoothing gate (TComPattern.cpp:196) on 32x32 4:4:4 chroma."""
    w, h = 192, 128
    rng = np.random.default_rng(5)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (rng.integers(0, 64, (h, w)) + yy + xx).astype(np.int32)
    y = np.clip(base, 0, 255)
    u = np.clip(200 - (base // 2), 0, 255).astype(np.int32)
    v = np.clip(base // 2 + 30, 0, 255).astype(np.int32)
    enc = Encoder(EncoderConfig(w, h, qp=27, intra_period=1,
                                chroma_format=3,
                                cross_component_prediction=True))
    au = enc.encode_frame([y, u, v], 0)
    f = tmp_path / "ccp.bin"
    f.write_bytes(au)
    out = subprocess.run([HM_DEC, "-b", str(f), "-o", "/dev/null"],
                         capture_output=True, text=True)
    assert out.stdout.count("(OK)") == 1, out.stdout
