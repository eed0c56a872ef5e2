"""Resize-deconv upsample strategies — is the phase interleave avoidable?

The decoder's 2x bilinear upsample (skyhdr/ops/resize.py
`_upsample_axis_int`, the reference's resize-deconv per ops.py:121-124)
materializes a stack+reshape interleave that profiled at ~2.3 ms per decode
at 64x256 b32 vs a ~0.7 ms copy floor (CLAUDE.md). Candidates:

  cur   : phase blend + stack/reshape interleave -> conv3x3 SAME
          (exactly ResizeDeconv's math today)
  dil   : 2x upsample expressed as ONE lax.conv_general_dilated
          (lhs_dilation=2, depthwise separable 4-tap kernel
          [.25,.75,.75,.25] on an edge-padded input — exact, incl. the
          clamp boundary) -> conv3x3 SAME. Lets XLA's native transposed-
          conv lowering do the interleave instead of a stack+reshape.
  fused : upsample AND the 3x3 conv as a single dilated conv with the
          composed 6x6 kernel Keff[t1,t2,ci,co] = sum_{m+k=t} W[m1,m2]
          K4[k1]K4[k2]. Exact in the interior; the conv3x3's zero-pad
          phantom ring differs on the outermost output row/col (the
          composed form sees the natural clamp extension u_nat[-1]=up(x0)
          instead of zeros).
  fus-x : fused + the EXACT border fix — the phantom ring is exactly the
          2x-upsampled boundary rows/cols (u_nat[-1,:]=up_w(x[0,:]),
          corners x[0,0] etc.), so four 1D strip convs subtracted from the
          outermost output ring restore SAME-conv semantics. Validated to
          f32 roundoff (fwd, dx, dW).

CONCLUSION (TPU, 2026-08-18): fus-x LOSES — the four strip convs + ring
updates cost ~3 ms of small-op overhead at decode1 (6.14 ms vs 3.26 dil)
and ~0.4 ms at decode2, exceeding the composed conv's win (fused-nat beats
dil by only 0.3-0.9 ms). The production path stays upsample-dilconv +
separate conv3x3 (skyhdr/ops/resize.py). fused-nat is unusable directly
(wrong border semantics vs the reference).

Timing uses the chained distinct-input protocol (tools/bench_daconv.py).
Run on TPU: PYTHONPATH=/root/repo python tools/exp_resize.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def up2_interleave(x):
    from skyhdr.ops.resize import resize_bilinear
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w))


K4 = np.asarray([0.25, 0.75, 0.75, 0.25], np.float32)


def up2_dil(x):
    """2x half-pixel bilinear upsample as one dilated depthwise conv.

    dilate2(edgepad1(x)) correlated VALID with the separable 4-tap kernel
    reproduces u[2i] = .25 x[i-1] + .75 x[i], u[2i+1] = .75 x[i] + .25
    x[i+1] with edge clamp — bit-exact vs the interleave path.
    """
    c = x.shape[-1]
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k = jnp.asarray(K4, x.dtype)
    rhs = (k[:, None] * k[None, :])[:, :, None, None]
    rhs = jnp.broadcast_to(rhs, (4, 4, 1, c)).astype(x.dtype)
    # HIGHEST precision: the TPU default runs single-pass bf16 matmuls
    # (measured 7.6e-3 abs diff vs the elementwise interleave); this conv
    # is depthwise/bandwidth-bound so full precision costs nothing.
    return lax.conv_general_dilated(
        xe, rhs, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=lax.Precision.HIGHEST)


def conv3_same(u, W):
    return lax.conv_general_dilated(
        u, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fused_nat(x, W):
    """Composed upsample+conv3x3 as ONE dilated conv (natural-extension
    boundary: exact except the outermost output ring)."""
    k = jnp.asarray(K4, x.dtype)
    # Keff[t] = sum_{m+k=t} W[m] K4[k] along each spatial axis.
    # Build by correlating W's spatial dims with K4 (full convolution).
    Wf = W.astype(jnp.float32)
    keff = jnp.zeros((6, 6) + W.shape[2:], jnp.float32)
    for m1 in range(3):
        for k1 in range(4):
            for m2 in range(3):
                for k2 in range(4):
                    keff = keff.at[m1 + k1, m2 + k2].add(
                        Wf[m1, m2] * float(K4[k1]) * float(K4[k2]))
    keff = keff.astype(x.dtype)
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # z2 = zero-pad the dilated grid by 1 on each side -> padding=(1,1).
    # Default precision to match what the model's conv3x3 itself runs at.
    return lax.conv_general_dilated(
        xe, keff, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _up1d(x4, axis):
    """2x half-pixel bilinear upsample of a 4D tensor along one spatial axis."""
    from skyhdr.ops.resize import resize_bilinear
    b, h, w, c = x4.shape
    size = (2 * h, w) if axis == 1 else (h, 2 * w)
    return resize_bilinear(x4, size)


def fused_exact(x, W):
    """Upsample+conv3x3 as ONE 6x6 dilated conv PLUS exact border fix.

    fused_nat's only deviation from conv3_same(up2(x), W) is the outermost
    output ring: the composed conv sees the clamp-extended phantom values
    u_nat[-1,:] = up_w(x[0,:]) (with corners x[0,0]/x[0,w-1]) instead of the
    SAME-conv's zero pad. Derivation: u_nat[-1] = .75 x[-1] + .25 x[0] =
    x[0] under clamp, and the dilated grid's zero-pad slot at index -1 is an
    odd (zero) slot of the natural dilation, so the composed conv reproduces
    the clamp extension exactly. The fix subtracts four 1D strip convs:

      row 0    -= conv1d_w([x00, up_w(x[0,:]), x0W], W[0,:])   (VALID)
      row -1   -= conv1d_w([xH0, up_w(x[-1,:]), xHW], W[2,:])  (VALID)
      col 0    -= conv1d_h(up_h(x[:,0]), W[:,0])               (SAME-zero)
      col -1   -= conv1d_h(up_h(x[:,-1]), W[:,2])              (SAME-zero)

    Corner phantoms live in the row strips only (the col strips zero-pad),
    so nothing is double-counted.
    """
    y = fused_nat(x, W)
    dn = ("NHWC", "HWIO", "NHWC")

    def row_corr(row, wslice):
        # row: (b, w, c); strip = [corner, up_w(row), corner] length 2w+2.
        strip = _up1d(row[:, None, :, :], axis=2)            # (b,1,2w,c)
        strip = jnp.concatenate(
            [row[:, None, :1, :], strip, row[:, None, -1:, :]], axis=2)
        return lax.conv_general_dilated(
            strip, wslice, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)

    def col_corr(col, wslice):
        strip = _up1d(col[:, :, None, :], axis=1)            # (b,2h,1,c)
        return lax.conv_general_dilated(
            strip, wslice, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn)

    c_top = row_corr(x[:, 0], W[0:1])
    c_bot = row_corr(x[:, -1], W[2:3])
    c_left = col_corr(x[:, :, 0], W[:, 0:1])
    c_right = col_corr(x[:, :, -1], W[:, 2:3])
    y = y.at[:, :1, :, :].add(-c_top)
    y = y.at[:, -1:, :, :].add(-c_bot)
    y = y.at[:, :, :1, :].add(-c_left)
    y = y.at[:, :, -1:, :].add(-c_right)
    return y


def timeit_inputs(fn, inputs):
    chained = jax.jit(lambda c, x: jnp.sum(fn(x + c)) * 0)
    carry = chained(jnp.zeros((), inputs[0].dtype), inputs[0])
    float(carry)
    timed = inputs[1:]
    t0 = time.perf_counter()
    for x in timed:
        carry = chained(carry, x)
    float(carry)
    return (time.perf_counter() - t0) / len(timed)


def main():
    rng = np.random.default_rng(0)

    # Numeric validation (any backend).
    for (h, w, c, f) in [(5, 9, 3, 4), (16, 64, 8, 8)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        W = jnp.asarray(rng.standard_normal((3, 3, c, f)).astype(np.float32))
        u0 = np.asarray(up2_interleave(x))
        u1 = np.asarray(up2_dil(x))
        assert np.allclose(u0, u1, atol=1e-4), np.abs(u0 - u1).max()
        y0 = np.asarray(conv3_same(jnp.asarray(u0), W))
        y2 = np.asarray(fused_nat(x, W))
        interior = np.abs(y0[:, 1:-1, 1:-1] - y2[:, 1:-1, 1:-1]).max()
        border = np.abs(y0 - y2).max()
        print(f"validate h{h}w{w}: up exact={np.abs(u0-u1).max():.2e} "
              f"fused interior={interior:.2e} full(border diff)={border:.2e}")
        # On TPU both sides run default (reduced) matmul precision; the
        # bit-exactness claim is validated on CPU, here we only gate gross
        # errors before timing.
        assert interior < 3e-2 * (np.abs(y0).max() + 1e-6)

    # TPU timing at the 64x256 decode shapes.
    n = 12
    for (b, h, w, c, f, tag) in [
        (32, 16, 64, 256, 128, "decode1"),
        (32, 32, 128, 128, 64, "decode2"),
    ]:
        xs = [jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
              for _ in range(n)]
        W = jnp.asarray(
            (rng.standard_normal((3, 3, c, f)) * 0.05).astype(np.float32))
        for name, fn in [
            ("cur  ", lambda x: conv3_same(up2_interleave(x), W)),
            ("dil  ", lambda x: conv3_same(up2_dil(x), W)),
            ("fused", lambda x: fused_nat(x, W)),
            ("fus-x", lambda x: fused_exact(x, W)),
            ("up-cur", up2_interleave),
            ("up-dil", up2_dil),
        ]:
            ms = timeit_inputs(fn, xs) * 1e3
            # Train-style: value + grad wrt x (the decoder input) and W.
            gfn = jax.grad(lambda x, k=fn: jnp.sum(jnp.tanh(k(x))))
            gms = timeit_inputs(gfn, xs) * 1e3
            print(f"[{tag}] {name} ({b},{h},{w},{c})->f{f}: "
                  f"fwd {ms:.3f} ms  bwd {gms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
