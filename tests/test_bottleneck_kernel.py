"""Fused int8 bottleneck megakernel vs the composed three-conv reference
(interpret mode; the reference path is plain lax/jnp int8 arithmetic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from anakin_tpu.kernels.bottleneck_int8 import bottleneck_int8


def _requant(y, scale):
    return np.clip(np.round(y / scale), -127, 127).astype(np.int8)


def reference(x, wa, wsa, wb, wsb, wc, wsc, ba, bb, bc, scales):
    in_scale, a_scale, b_scale, res_scale, out_scale = scales
    xf = x.astype(np.int32)
    # 1x1 reduce
    ya = np.einsum("nhwc,cp->nhwp", xf, wa.astype(np.int32))
    fa = ya.astype(np.float32) * (in_scale * wsa)
    if ba is not None:
        fa = fa + ba
    qa = _requant(np.maximum(fa, 0), a_scale)
    # 3x3
    yb = np.asarray(lax.conv_general_dilated(
        jnp.asarray(qa), jnp.asarray(wb), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))
    fb = yb.astype(np.float32) * (a_scale * wsb)
    if bb is not None:
        fb = fb + bb
    qb = _requant(np.maximum(fb, 0), b_scale)
    # 1x1 expand + residual
    yc = np.einsum("nhwp,pc->nhwc", qb.astype(np.int32), wc.astype(np.int32))
    fc = yc.astype(np.float32) * (b_scale * wsc)
    if bc is not None:
        fc = fc + bc
    fc = np.maximum(fc + x.astype(np.float32) * res_scale, 0)
    if out_scale is not None:
        return _requant(fc, out_scale)
    return fc.astype(np.float32)


@pytest.mark.parametrize("H,C,P,bias,out_q", [
    (8, 256, 128, True, True),
    (8, 256, 128, False, False),
    (12, 128, 128, True, True),
])
def test_bottleneck_matches_reference(rng, H, C, P, bias, out_q):
    N, W = 2, H
    x = rng.integers(-80, 80, (N, H, W, C)).astype(np.int8)
    wa = rng.integers(-60, 60, (C, P)).astype(np.int8)
    wb = rng.integers(-20, 20, (3, 3, P, P)).astype(np.int8)
    wc = rng.integers(-60, 60, (P, C)).astype(np.int8)
    wsa = rng.uniform(1e-4, 3e-4, P).astype(np.float32)
    wsb = rng.uniform(1e-4, 3e-4, P).astype(np.float32)
    wsc = rng.uniform(1e-4, 3e-4, C).astype(np.float32)
    ba = rng.normal(0, 0.1, P).astype(np.float32) if bias else None
    bb = rng.normal(0, 0.1, P).astype(np.float32) if bias else None
    bc = rng.normal(0, 0.1, C).astype(np.float32) if bias else None
    scales = (2e-2, 1.5e-2, 1.2e-2, 2e-2, 2.5e-2 if out_q else None)

    want = reference(x, wa, wsa, wb, wsb, wc, wsc, ba, bb, bc, scales)
    got = np.asarray(bottleneck_int8(
        jnp.asarray(x), jnp.asarray(wa), jnp.asarray(wsa), jnp.asarray(wb),
        jnp.asarray(wsb), jnp.asarray(wc), jnp.asarray(wsc),
        None if ba is None else jnp.asarray(ba),
        None if bb is None else jnp.asarray(bb),
        None if bc is None else jnp.asarray(bc),
        in_scale=scales[0], a_scale=scales[1], b_scale=scales[2],
        res_scale=scales[3], out_scale=scales[4], interpret=True))

    if out_q:
        # int8 result: allow off-by-one from round-at-threshold
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert (diff <= 1).all() and (diff == 0).mean() > 0.99
    else:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
