"""On-TPU experiments for the fused-MLP kernel redesign (round 2 perf push).

Variants (all forward-only, bf16 compute, fine-pass size 8.4M points):
  base        current production kernel, PE outside (kernel-only time)
  ilp2        PE outside, tile split into 2 independent lane-slices so Mosaic
              can overlap one slice's VPU epilogue with the other's MXU matmul
  pe          PE computed inside the kernel from a packed (8, T) f32 input
              (xyz rows 0:3, dir rows 3:6) - kills the XLA-side PE pass, the
              pad copies, and 6x of the input DMA traffic
  pe_ilp2/4   combined
  pe_ilp2_t8192  combined at TILE 8192 (VMEM gets tighter; fewer grid steps)

Also: bitonic-merge-of-two-sorted-rows vs jnp.sort for the coarse+fine z merge.

Run serially in ONE process (the axon tunnel admits one TPU process).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import functools
import time

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.core.activations import shifted_softplus, widened_sigmoid
from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.ops.fused_mlp_t import (
    DIR_CH,
    DIR_PAD,
    OUT_PAD,
    XYZ_CH,
    XYZ_PAD,
    _forward_t,
    pack_weights_t,
)
from sinnerf_tpu.utils.profiling import time_fn

N_PTS = 65536 * 128  # fine-pass size


def pe_rows(x3, n_freqs, pad_to, dtype):
    """Blocked PE inside the kernel: (3, T) f32 -> (pad_to, T) dtype.

    Double-angle recurrence with exact restart every 4 doublings, same as
    core.encoding.positional_encoding_blocked_t.
    """
    sins, coss = [], []
    s = c = None
    for k in range(n_freqs):
        if k % 4 == 0:
            xk = x3 * (2.0 ** k)
            s, c = jnp.sin(xk), jnp.cos(xk)
        else:
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
        sins.append(s)
        coss.append(c)
    parts = [x3] + sins + coss
    out = jnp.concatenate(parts, axis=0)
    pad = pad_to - out.shape[0]
    if pad:
        out = jnp.concatenate(
            [out, jnp.zeros((pad, out.shape[1]), out.dtype)], axis=0
        )
    return out.astype(dtype)


def make_variant(in_pe: bool, ilp: int, tile: int, use_new_activation=True):
    """Build a jittable forward fn for one kernel variant."""

    def kernel(*refs):
        if in_pe:
            x_ref, *rest = refs
        else:
            x_ref, d_ref, *rest = refs
        (
            w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
            b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
            rgb_ref, sig_ref,
        ) = rest

        tk = tile // ilp
        sl = [pl.ds(i * tk, tk) for i in range(ilp)]

        if in_pe:
            xin = x_ref[:]  # (8, tile) f32
            xs = [
                pe_rows(xin[0:3, i * tk:(i + 1) * tk], 10, XYZ_PAD, jnp.bfloat16)
                for i in range(ilp)
            ]
            ds = [
                pe_rows(xin[3:6, i * tk:(i + 1) * tk], 4, DIR_PAD, jnp.bfloat16)
                for i in range(ilp)
            ]
        else:
            xs = [x_ref[:, s_] for s_ in sl]
            ds = [d_ref[:, s_] for s_ in sl]

        act = jax.nn.relu
        cd = jnp.bfloat16

        def dot(a_ref, b_val):
            return jnp.dot(a_ref[:], b_val, preferred_element_type=jnp.float32)

        def layer(w, b, hs, xs_extra=None, wx=None):
            out = []
            for i in range(ilp):
                a = dot(w, hs[i])
                if wx is not None:
                    a = a + dot(wx, xs_extra[i])
                out.append(act(a + b[:]).astype(cd))
            return out

        hs = layer(w1, b1, xs)
        hs = layer(w2, b2, hs)
        hs = layer(w3, b3, hs)
        hs = layer(w4, b4, hs)
        hs = layer(w5h, b5, hs, xs, w5x)
        hs = layer(w6, b6, hs)
        hs = layer(w7, b7, hs)
        hs = layer(w8, b8, hs)

        for i in range(ilp):
            sigma = dot(wsig, hs[i]) + bsig[:]
            sig_ref[:, sl[i]] = sigma.astype(sig_ref.dtype)

        fs = [(dot(wfin, hs[i]) + bfin[:]).astype(cd) for i in range(ilp)]
        das = []
        for i in range(ilp):
            a_d = dot(wdh, fs[i]) + dot(wdx, ds[i]) + bd[:]
            das.append(
                (shifted_softplus(a_d) if use_new_activation else act(a_d)).astype(cd)
            )
        for i in range(ilp):
            rgb = dot(wrgb, das[i]) + brgb[:]
            rgb = widened_sigmoid(rgb) if use_new_activation else jax.nn.sigmoid(rgb)
            rgb_ref[:, sl[i]] = rgb.astype(rgb_ref.dtype)

    def forward(x_packed_or_pe, d_pe, operands):
        n = x_packed_or_pe.shape[1]
        grid = (n // tile,)
        if in_pe:
            in_specs = [
                pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
            ]
            args = (x_packed_or_pe,)
        else:
            in_specs = [
                pl.BlockSpec((XYZ_PAD, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((DIR_PAD, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ]
            args = (x_packed_or_pe, d_pe)
        for op in operands:
            in_specs.append(
                pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
        rgb, sig = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((OUT_PAD, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((OUT_PAD, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
                jax.ShapeDtypeStruct((OUT_PAD, n), jnp.float32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(*args, *operands)
        return rgb, sig

    return forward


def bitonic_merge_sorted(a, b):
    """Merge per-row-sorted a (N, Ka) and b (N, Kb) -> sorted (N, Ka+Kb).

    Concatenate a (ascending) with reversed b (descending) -> bitonic row;
    pad to a power of two with +inf between the halves keeps it bitonic;
    then log2(L) compare-exchange stages, all reshapes + min/max.
    """
    ka, kb = a.shape[-1], b.shape[-1]
    k = ka + kb
    L = 1 << (k - 1).bit_length()
    pad = L - k
    pinf = jnp.full((*a.shape[:-1], pad), jnp.inf, a.dtype)
    x = jnp.concatenate([a, pinf, b[..., ::-1]], axis=-1)
    d = L // 2
    while d >= 1:
        y = x.reshape(*x.shape[:-1], -1, 2, d)
        lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
        hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
        x = jnp.stack([lo, hi], axis=-2).reshape(*x.shape)
        d //= 2
    return x[..., :k]


def main():
    params = init_nerf_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    n = N_PTS

    operands = pack_weights_t(params, jnp.bfloat16)
    operands = jax.tree_util.tree_map(jnp.asarray, operands)

    xyz = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))

    # packed input for in-kernel-PE variants
    x_packed = jnp.concatenate(
        [xyz, dirs, jnp.zeros((2, n), jnp.float32)], axis=0
    )

    # pre-padded PE inputs for PE-outside variants (kernel-only timing)
    from sinnerf_tpu.core.encoding import positional_encoding_blocked_t

    xpe = jnp.pad(
        positional_encoding_blocked_t(xyz, 10, out_dtype=jnp.bfloat16),
        ((0, XYZ_PAD - XYZ_CH), (0, 0)),
    )
    dpe = jnp.pad(
        positional_encoding_blocked_t(dirs, 4, out_dtype=jnp.bfloat16),
        ((0, DIR_PAD - DIR_CH), (0, 0)),
    )

    flops = n * 1.19e6  # useful MLP FLOPs
    rows = []

    def report(name, dt):
        rows.append((name, dt))
        print(f"{name:24s} {dt*1e3:8.2f} ms   {flops/dt/1e12:6.1f} TF/s", flush=True)

    # 0. current production kernel, kernel-only
    t0 = time.perf_counter()
    dt = time_fn(
        lambda x, d: _forward_t(x, d, operands, True, False)[0], xpe, dpe, iters=10
    )
    print(f"[compile+run {time.perf_counter()-t0:.0f}s]", flush=True)
    report("base (kernel only)", dt)

    variants = [
        ("ilp2", False, 2, 4096),
        ("pe", True, 1, 4096),
        ("pe_ilp2", True, 2, 4096),
        ("pe_ilp4", True, 4, 4096),
        ("pe_ilp2_t8192", True, 2, 8192),
    ]
    for name, in_pe, ilp, tile in variants:
        fwd = make_variant(in_pe, ilp, tile)
        t0 = time.perf_counter()
        try:
            if in_pe:
                dt = time_fn(lambda x: fwd(x, None, operands)[0], x_packed, iters=10)
            else:
                dt = time_fn(lambda x, d: fwd(x, d, operands)[0], xpe, dpe, iters=10)
            print(f"[compile+run {time.perf_counter()-t0:.0f}s]", flush=True)
            report(name, dt)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # correctness spot-check of the pe variant vs production (small n, on TPU)
    fwd = make_variant(True, 2, 4096)
    ns = 8192
    rgb, sig = fwd(x_packed[:, :ns], None, operands)
    rgb0, sig0 = _forward_t(xpe[:, :ns], dpe[:, :ns], operands, True, False)
    err = float(jnp.max(jnp.abs(rgb[0:3] - rgb0[0:3]))) + float(
        jnp.max(jnp.abs(sig[0:1] - sig0[0:1]))
    )
    print(f"pe_ilp2 vs base max |err| (bf16 compute): {err:.3e}", flush=True)

    # z-merge: jnp.sort vs bitonic merge of two sorted rows
    n_rays = 65536
    za = jnp.sort(jnp.asarray(rng.uniform(2, 6, (n_rays, 64)).astype(np.float32)), axis=-1)
    zb = jnp.sort(jnp.asarray(rng.uniform(2, 6, (n_rays, 128)).astype(np.float32)), axis=-1)
    dt_sort = time_fn(
        lambda a, b: jnp.sort(jnp.concatenate([a, b], axis=-1), axis=-1), za, zb, iters=20
    )
    dt_merge = time_fn(lambda a, b: bitonic_merge_sorted(a, b), za, zb, iters=20)
    ok = bool(
        jnp.all(
            bitonic_merge_sorted(za, zb)
            == jnp.sort(jnp.concatenate([za, zb], axis=-1), axis=-1)
        )
    )
    print(f"z-merge: sort {dt_sort*1e3:.2f} ms, bitonic {dt_merge*1e3:.2f} ms, equal={ok}", flush=True)


if __name__ == "__main__":
    main()
