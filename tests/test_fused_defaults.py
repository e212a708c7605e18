"""Tri-state fused-path switches ("off"/"auto"/"on"): "auto" is the
production default class — fused kernels engage on real TPU only, so
CPU users and golden-parity tests keep the exact module chain without
pinning.  "on" additionally allows CPU interpret mode (kernel tests).
Also covers evaluate --exact's force_exact_chain()."""

import pytest

import tpu_superresolution_tpu.models.dat as datmod
import tpu_superresolution_tpu.ops.pallas.fused_channel_attn as fc
import tpu_superresolution_tpu.ops.pallas.fused_datb_tail as ft
import tpu_superresolution_tpu.ops.pallas.fused_rect_attn as fr


@pytest.fixture(autouse=True)
def _restore():
    old = (ft.FUSED_TAIL, fr.FUSED_RECT, fr.FUSED_RECT_SHIFTED,
           fc.FUSED_CHAN, datmod.CHAN_ATTN_IMPL)
    yield
    (ft.FUSED_TAIL, fr.FUSED_RECT, fr.FUSED_RECT_SHIFTED,
     fc.FUSED_CHAN, datmod.CHAN_ATTN_IMPL) = old


def test_auto_is_tpu_only_on_cpu_backend():
    # conftest forces the cpu backend: "auto" must refuse, "on" accept.
    ft.FUSED_TAIL = "auto"
    fr.FUSED_RECT = "auto"
    fc.FUSED_CHAN = "auto"
    assert not ft.fused_tail_ok(64, 64)
    assert not fr.fused_rect_ok(64, 64, 8, 16)
    assert not fc.fused_chan_ok(64, 64)
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"
    fc.FUSED_CHAN = "on"
    assert ft.fused_tail_ok(64, 64)
    assert fr.fused_rect_ok(64, 64, 8, 16)
    assert fc.fused_chan_ok(64, 64)


def test_batch_multiplies_into_pixel_ceiling():
    ft.FUSED_TAIL = "on"
    fr.FUSED_RECT = "on"
    assert ft.fused_tail_ok(192, 192, b=1)
    assert not ft.fused_tail_ok(192, 192, b=2)
    assert not ft.fused_tail_ok(256, 256, b=1)
    assert fr.fused_rect_ok(192, 192, 8, 16, b=1)
    assert not fr.fused_rect_ok(192, 192, 8, 16, b=4)
    assert not fr.fused_rect_ok(256, 256, 8, 16, b=1)


def test_shifted_rect_needs_8_divisible_windows_per_strip():
    # Mosaic rejects the [windows-per-strip, N] region-id mask block
    # unless the sublane dim % 8 == 0 (measured at w=48 in
    # dat_fused_eval_check2); non-shifted has no mask input.
    fr.FUSED_RECT = "on"
    fr.FUSED_RECT_SHIFTED = "on"
    assert fr.fused_rect_ok(48, 48, 8, 16, shifted=False, b=4)
    assert not fr.fused_rect_ok(48, 48, 8, 16, shifted=True, b=4)
    assert fr.fused_rect_ok(64, 64, 8, 16, shifted=True)
    assert fr.fused_rect_ok(192, 192, 8, 16, shifted=True)


def test_chan_attn_auto_resolves_heads_on_cpu():
    datmod.CHAN_ATTN_IMPL = "auto"
    assert datmod.resolved_chan_attn_impl() == "heads"
    datmod.CHAN_ATTN_IMPL = "blockdiag"
    assert datmod.resolved_chan_attn_impl() == "blockdiag"


def test_force_exact_chain_resets_every_switch():
    ft.FUSED_TAIL = "auto"
    fr.FUSED_RECT = "on"
    fr.FUSED_RECT_SHIFTED = "auto"
    fc.FUSED_CHAN = "auto"
    datmod.CHAN_ATTN_IMPL = "auto"
    datmod.force_exact_chain()
    assert ft.FUSED_TAIL == "off"
    assert fr.FUSED_RECT == "off"
    assert fr.FUSED_RECT_SHIFTED == "off"
    assert fc.FUSED_CHAN == "off"
    assert datmod.CHAN_ATTN_IMPL == "heads"
