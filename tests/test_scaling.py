"""Scaling-efficiency model (parallel/scaling.py) — pure-math tier.

The analytic ICI payload/efficiency model backs BASELINE.md's >=80%
multi-host target in the absence of multi-chip hardware (round-3 verdict
#6); these tests pin its arithmetic so the reported table can't drift.
"""
import pytest

from webgpu_msm_tpu.parallel import scaling
from webgpu_msm_tpu.ops import pippenger, windows


def test_payload_bytes_window_sums():
    # w=13: K = ceil(256/13) = 20 windows; [4,16] u32 planes per point
    assert windows.n_windows(13) == 20
    assert scaling.payload_bytes(13, True, "window_sums") == 20 * 4 * 16 * 4


def test_payload_bytes_buckets_mode_scales_with_B():
    B = pippenger.n_buckets(13, True)
    assert scaling.payload_bytes(13, True, "buckets") == 20 * B * 4 * 16 * 4
    assert scaling.payload_bytes(13, True, "buckets") > 1e6  # MB-class


def test_modeled_efficiency_bounds():
    pl = scaling.payload_bytes(13, True, "window_sums")
    assert scaling.modeled_efficiency(0.48, pl, 1) == 1.0
    for d in (2, 4, 8, 64):
        e = scaling.modeled_efficiency(0.48, pl, d)
        assert 0.0 < e <= 1.0
        # tiny window-sums payload vs 0.48 s compute: near-linear
        assert e > 0.99


def test_modeled_efficiency_degrades_with_payload():
    pl_ws = scaling.payload_bytes(13, True, "window_sums")
    pl_bk = scaling.payload_bytes(13, True, "buckets")
    e_ws = scaling.modeled_efficiency(0.48, pl_ws, 8)
    e_bk = scaling.modeled_efficiency(0.48, pl_bk, 8)
    assert e_bk < e_ws
    # buckets mode still clears the >=80% bar at D=8 under the model
    assert e_bk > 0.8
