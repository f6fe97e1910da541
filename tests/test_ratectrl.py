"""R-lambda rate control: model math sanity + end-to-end rate accuracy.

The accuracy bar mirrors the reference's own behavior class (R-lambda
converges to the target over a few pictures; JCTVC-K0103)."""

import numpy as np
import pytest

from hm16_2_tpu.encode.ratectrl import RateCtrl, frame_intra_cost


def test_model_monotonic():
    rc = RateCtrl(400_000, 30, 64, 416, 240, gop_kind="ld1")
    rc.begin_gop()
    qp_hi, lam_hi = rc.begin_picture(0, False)
    rc2 = RateCtrl(4_000_000, 30, 64, 416, 240, gop_kind="ld1")
    rc2.begin_gop()
    qp_lo, lam_lo = rc2.begin_picture(0, False)
    assert lam_lo < lam_hi          # more bits -> smaller lambda
    assert qp_lo <= qp_hi


def test_alpha_beta_update_direction():
    rc = RateCtrl(400_000, 30, 64, 416, 240)
    rc.begin_gop()
    qp, lam = rc.begin_picture(0, False)
    a0, b0 = rc.pic_para[1]
    # overshoot: the lambda we used produced far more bits than the model
    # predicted, so the model must steepen (alpha up -> higher lambda and
    # QP for the same bpp next time)
    rc.update_after_picture(10 ** 6)
    a1, b1 = rc.pic_para[1]
    assert a1 > a0


def test_intra_cost_positive():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (64, 64)).astype(np.int32)
    assert frame_intra_cost(y) > 0
    assert frame_intra_cost(np.zeros((64, 64), np.int32)) == 0


def test_encode_rate_accuracy():
    """End-to-end: encoded bitrate lands near the target and the stream
    still self-decodes bit-exactly."""
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    w, h, n, fps = 64, 64, 12, 30
    target = 250_000
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.int32)
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=n * 2,
                                target_bps=target, frame_rate=fps,
                                total_frames=n))
    stream = b""
    for t in range(n):
        y = base[t:t + h, t * 2:t * 2 + w]
        u = np.full((h // 2, w // 2), 100, np.int32)
        v = np.full((h // 2, w // 2), 140, np.int32)
        stream += enc.encode_frame([y, u, v], t)
    achieved = len(stream) * 8 * fps / n
    # later pictures must have converged: per-frame rate of the second
    # half within 45% of target (I-frame skews the first half)
    tail_bits = sum(enc.bits_per_frame[n // 2:])
    tail_rate = tail_bits * fps / (n - n // 2)
    assert abs(tail_rate - target) / target < 0.45, (achieved, tail_rate)
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == n and all(p.hash_ok for p in pics)

def test_ctu_level_rc():
    """CTU-level RC (LCULevelRC, TEncRateCtrl.cpp:761-944): per-CTU
    lambda/QP from the LCU bit-weight model with actual-bit feedback.
    The stream must signal cu_qp_delta, land near the target, and
    self-decode bit-exactly."""
    from hm16_2_tpu.decode.top import Decoder
    from hm16_2_tpu.encode.top import Encoder, EncoderConfig
    w, h, n, fps = 128, 128, 8, 30
    target = 300_000
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (110 + 70 * np.sin(xx / 19.0) * np.cos(yy / 11.0)
            + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.int32)
    enc = Encoder(EncoderConfig(w, h, qp=32, intra_period=0,
                                target_bps=target, frame_rate=fps,
                                total_frames=n, rc_ctu=True))
    assert enc.cfg.rc_ctu and enc.rc.lcu_rc
    stream = b""
    qps = []
    for t in range(n):
        y = (np.roll(base, 2 * t, axis=1)
             + rng.integers(-2, 3, (h, w))).clip(0, 255)
        u = np.full((h // 2, w // 2), 100, np.int32)
        v = np.full((h // 2, w // 2), 140, np.int32)
        stream += enc.encode_frame([y, u, v], t)
        if enc.rc.history:
            qps.append(enc.rc.history[-1][2])
    tail_bits = sum(enc.bits_per_frame[n // 2:])
    tail_rate = tail_bits * fps / (n - n // 2)
    assert abs(tail_rate - target) / target < 0.45, tail_rate
    dec = Decoder()
    pics = dec.decode_stream(stream)
    assert len(pics) == n and all(p.hash_ok for p in pics)
    # the per-CTU model produced at least one picture whose average QP
    # differs from another's (the model actually adapts)
    assert len(set(qps)) > 1, qps


def test_ctu_rc_model_state():
    """ctu_begin/ctu_update bookkeeping: bits-left decreases, per-LCU
    alpha/beta adapt, neighbor-QP clip chain holds (+-1)."""
    rc = RateCtrl(500_000, 30, 30, 128, 128, lcu_rc=True, ctb=64)
    rc.begin_gop()
    qp_pic, lam_pic = rc.begin_picture(0, False)
    p = rc.pic
    assert p["lcu_left"] == 4 and len(p["lcu_weights"]) == 4
    prev_qp = None
    for i in range(4):
        qp, lam = rc.ctu_begin(i)
        assert abs(qp - qp_pic) <= 2
        if prev_qp is not None:
            assert abs(qp - prev_qp) <= 1
        rc.ctu_update(i, 5000, qp, lam)
        prev_qp = qp
    assert p["lcu_left"] == 0
    assert p["lcu_bits_left"] < p["target"]
    rc.update_after_picture(20000)
    assert rc.pic is None
