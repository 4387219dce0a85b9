"""Round-3 in-kernel pipelining experiments for the train BACKWARD kernel.

The round-2 speed-of-light accounting (DESIGN.md §9) put the fine-pass
backward at 68.2ms = 84% of bf16 peak and attributed the remaining gap to
"in-kernel MXU pipelining".  These experiments decompose that gap with
ablations of the production kernel (`ops/fused_render_train_t._train_bwd_kernel`)
and test two restructurings that could actually recover it:

  base        faithful copy of the production kernel (sanity: must match its
              measured time)
  no_db       bias-grad lane reductions removed        -> cost of 12 VPU
              cross-lane sums per (sample, tile)
  no_mask     relu-mask recompute (bf16->f32 cast + compare + mult) removed
  no_dw       weight-grad accumulate dots removed      -> MXU share of dW
  mxu_floor   xyz-PE replaced by a constant, all VPU epilogues removed —
              the pure-matmul floor of this loop structure
  two_stream  da_alpha fully precomputed in Stage A (descending suffix AND
              ascending transmittance), making the per-sample MLP backprops
              independent; the loop then interleaves TWO sample chains so
              Mosaic can overlap one chain's VPU epilogue with the other's
              MXU work ("weight-stationary two-stream")

Ablated variants compute WRONG gradients (timing probes only); `base` and
`two_stream` are exact and verified against the production kernel output.

Run serially in ONE process (the axon tunnel admits one TPU process).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sinnerf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.ops.fused_mlp_t import (
    DIR_CH,
    DIR_PAD,
    N_FREQS_DIR,
    N_FREQS_XYZ,
    XYZ_CH,
    XYZ_PAD,
    _pe_concat,
    _pe_fwd,
    pack_weights_t,
)
from sinnerf_tpu.ops.fused_mlp_t import round8 as _round8
from sinnerf_tpu.ops.fused_render_train_t import (
    RAY_OUT,
    _frlt_bwd,
    _frlt_fwd,
    _prep,
    _run_fwd,
    _weight_specs,
)
from sinnerf_tpu.utils.profiling import time_fn

N_RAYS = int(os.environ.get("EXP_N_RAYS", "16384"))
N_SAMPLES = int(os.environ.get("EXP_N_SAMPLES", "192"))  # fine pass dominates


def _exp_bwd_kernel(
    rays_ref, z_ref, w_ref, a_ref, rgb_ref, gout_ref, gw_ref, *refs,
    n_samples: int, cdtype: str, abl: frozenset, n_streams: int,
):
    """Parameterized copy of the production `_train_bwd_kernel` (no-noise,
    black-background, new-activation path — the bench train configuration)."""
    (
        w1, w2, w3, w4, w5h, w5x, w6, w7, w8, wfin, wdh, wdx, wrgb, wsig,
        b1, b2, b3, b4, b5, b6, b7, b8, bfin, bd, brgb, bsig,
        dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
        dwrgb, dwsig,
        db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd, dbrgb, dbsig,
        dsig_scr,
    ) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (
            dw1, dw2, dw3, dw4, dw5h, dw5x, dw6, dw7, dw8, dwfin, dwdh, dwdx,
            dwrgb, dwsig, db1, db2, db3, db4, db5, db6, db7, db8, dbfin, dbd,
            dbrgb, dbsig,
        ):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    cd = jnp.bfloat16 if cdtype == "bfloat16" else jnp.float32
    r = rays_ref.shape[1]
    s8 = w_ref.shape[0]
    rays = rays_ref[:]
    o3 = rays[0:3]
    d3 = rays[3:6]
    dnorm = jnp.sqrt(jnp.sum(d3 * d3, axis=0, keepdims=True))

    g = gout_ref[:]
    g_rgb = g[0:3]
    g_depth = g[3:4]

    def c_at(s):
        cr = (
            g_rgb[0:1] * rgb_ref[pl.ds(s, 1), :]
            + g_rgb[1:2] * rgb_ref[pl.ds(s8 + s, 1), :]
            + g_rgb[2:3] * rgb_ref[pl.ds(2 * s8 + s, 1), :]
        )
        return cr + g_depth * z_ref[pl.ds(s, 1), :] + gw_ref[pl.ds(s, 1), :]

    # ---- Stage A: composite adjoint --------------------------------------
    def body_suffix(i, suffix):
        s = n_samples - 1 - i
        c_s = c_at(s)
        w_s = w_ref[pl.ds(s, 1), :]
        a_s = a_ref[pl.ds(s, 1), :]
        u_s = jnp.maximum(1.0 - a_s + 1e-10, 1e-10)
        dsig_scr[pl.ds(s, 1), :] = -suffix / u_s
        return suffix + c_s * w_s

    jax.lax.fori_loop(0, n_samples, body_suffix, jnp.zeros((1, r), jnp.float32))

    if n_streams > 1:
        # fold the ascending-transmittance part in too, so the MLP sweep has
        # NO sequential carry and streams can interleave:
        #   dsig_scr[s] <- c_s * T_s - S_s / u_s  (the full dL/dalpha_s)
        def body_trans(s, trans):
            a_s = a_ref[pl.ds(s, 1), :]
            dsig_scr[pl.ds(s, 1), :] = (
                c_at(s) * trans + dsig_scr[pl.ds(s, 1), :]
            )
            return trans * (1.0 - a_s + 1e-10)

        jax.lax.fori_loop(0, n_samples, body_trans, jnp.ones((1, r), jnp.float32))

    # ---- Stage B: MLP recompute + backprop -------------------------------
    sd, cdir = _pe_fwd(d3, N_FREQS_DIR)
    d_pe = _pe_concat(d3, sd, cdir, DIR_PAD - DIR_CH, cd)

    def dot(a_ref_, b_val):
        return jnp.dot(a_ref_[:], b_val, preferred_element_type=jnp.float32)

    def dot_nt(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_tn(w_ref_, a):
        return jax.lax.dot_general(
            w_ref_[:], a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    act = jax.nn.relu
    no_mask = "no_mask" in abl or "mxu_floor" in abl
    no_db = "no_db" in abl or "mxu_floor" in abl
    no_dw = "no_dw" in abl
    const_pe = "mxu_floor" in abl

    def rmask(h):
        if no_mask:
            return 1.0
        return h.astype(jnp.float32) > 0.0

    def bsum(ref, da):
        if not no_db:
            ref[:] += jnp.sum(da, axis=1, keepdims=True)

    def wacc(ref, a, b):
        if not no_dw:
            ref[:] += dot_nt(a, b)

    zero5 = jnp.zeros((RAY_OUT - 3, r), jnp.float32)
    zero7 = jnp.zeros((RAY_OUT - 1, r), jnp.float32)
    const_x = jnp.ones((XYZ_PAD, r), cd) * 0.01

    def chain(s, da_alpha, dad_acc, x_pre=None):
        """Recompute + backprop one sample; returns updated dwdx accumulator."""
        z_s = z_ref[pl.ds(s, 1), :]
        s_next = jnp.minimum(s + 1, n_samples - 1)
        z_next = z_ref[pl.ds(s_next, 1), :]
        delta = jnp.where(s == n_samples - 1, 1e10, z_next - z_s) * dnorm
        w_s = w_ref[pl.ds(s, 1), :]
        a_s = a_ref[pl.ds(s, 1), :]

        if x_pre is not None:
            x = x_pre
        elif const_pe:
            x = const_x
        elif "cheap_pe" in abl:
            # data-dependent (so the h-chain cannot be hoisted like the
            # const_pe/mxu_floor ablation allows) but trivially cheap:
            # isolates the true cost of the PE ladder + (64, R) concat
            x = (jnp.ones((XYZ_PAD, r), jnp.float32) * z_ref[pl.ds(s, 1), :] * 0.01).astype(cd)
        else:
            xyz = o3 + d3 * z_s
            sx, cx = _pe_fwd(xyz, N_FREQS_XYZ)
            x = _pe_concat(xyz, sx, cx, XYZ_PAD - XYZ_CH, cd)

        h1 = act(dot(w1, x) + b1[:]).astype(cd)
        h2 = act(dot(w2, h1) + b2[:]).astype(cd)
        h3 = act(dot(w3, h2) + b3[:]).astype(cd)
        h4 = act(dot(w4, h3) + b4[:]).astype(cd)
        h5 = act(dot(w5h, h4) + dot(w5x, x) + b5[:]).astype(cd)
        h6 = act(dot(w6, h5) + b6[:]).astype(cd)
        h7 = act(dot(w7, h6) + b7[:]).astype(cd)
        h8 = act(dot(w8, h7) + b8[:]).astype(cd)
        f = (dot(wfin, h8) + bfin[:]).astype(cd)
        a_d = dot(wdh, f) + dot(wdx, d_pe) + bd[:]
        from sinnerf_tpu.core.activations import shifted_softplus

        d_act = shifted_softplus(a_d).astype(cd)
        a_rgb = dot(wrgb, d_act) + brgb[:]
        sig_head = dot(wsig, h8) + bsig[:]

        ns = sig_head[0:1]
        dsig = da_alpha * (1.0 - a_s) * delta * (ns > 0.0).astype(jnp.float32)

        g_rgb_s = jnp.concatenate([w_s * g_rgb, zero5], axis=0)
        tt = jnp.tanh(0.5 * a_rgb)
        dact_rgb = 0.25 * (1.0 + 2e-3) * (1.0 - tt * tt)
        da_rgb = (g_rgb_s * dact_rgb).astype(cd)
        wacc(dwrgb, da_rgb, d_act)
        bsum(dbrgb, da_rgb)
        dd_act = dot_tn(wrgb, da_rgb)

        dssp = jax.nn.sigmoid(a_d - 1.0)
        da_d = (dd_act * dssp).astype(cd)
        wacc(dwdh, da_d, f)
        bsum(dbd, da_d)
        df = dot_tn(wdh, da_d).astype(cd)

        wacc(dwfin, df, h8)
        bsum(dbfin, df)
        dh8 = dot_tn(wfin, df)

        g_sig = jnp.concatenate([dsig, zero7], axis=0).astype(cd)
        wacc(dwsig, g_sig, h8)
        bsum(dbsig, g_sig)
        dh8 = dh8 + dot_tn(wsig, g_sig)

        da8 = (dh8 * rmask(h8)).astype(cd)
        wacc(dw8, da8, h7)
        bsum(db8, da8)
        da7 = (dot_tn(w8, da8) * rmask(h7)).astype(cd)
        wacc(dw7, da7, h6)
        bsum(db7, da7)
        da6 = (dot_tn(w7, da7) * rmask(h6)).astype(cd)
        wacc(dw6, da6, h5)
        bsum(db6, da6)
        da5 = (dot_tn(w6, da6) * rmask(h5)).astype(cd)
        wacc(dw5h, da5, h4)
        wacc(dw5x, da5, x)
        bsum(db5, da5)
        da4 = (dot_tn(w5h, da5) * rmask(h4)).astype(cd)
        wacc(dw4, da4, h3)
        bsum(db4, da4)
        da3 = (dot_tn(w4, da4) * rmask(h3)).astype(cd)
        wacc(dw3, da3, h2)
        bsum(db3, da3)
        da2 = (dot_tn(w3, da3) * rmask(h2)).astype(cd)
        wacc(dw2, da2, h1)
        bsum(db2, da2)
        da1 = (dot_tn(w2, da2) * rmask(h1)).astype(cd)
        wacc(dw1, da1, x)
        bsum(db1, da1)
        return dad_acc + da_d.astype(jnp.float32)

    def pe_at(s):
        z_s = z_ref[pl.ds(s, 1), :]
        xyz = o3 + d3 * z_s
        sx, cx = _pe_fwd(xyz, N_FREQS_XYZ)
        return _pe_concat(xyz, sx, cx, XYZ_PAD - XYZ_CH, cd)

    if "pe_pipe" in abl:
        # software-pipelined PE: x for sample s+1 is computed at the END of
        # iteration s, so the ~20-step VPU recurrence (the mxu_floor ablation
        # shows it costs ~14ms non-overlapped at the chain head) runs
        # concurrently with the backprop dots instead of stalling the MXU.
        def body_mlp(s, carry):
            trans, dad_acc, x_cur = carry
            a_s = a_ref[pl.ds(s, 1), :]
            da_alpha = c_at(s) * trans + dsig_scr[pl.ds(s, 1), :]
            dad_acc = chain(s, da_alpha, dad_acc, x_pre=x_cur)
            x_next = pe_at(jnp.minimum(s + 1, n_samples - 1))
            return trans * (1.0 - a_s + 1e-10), dad_acc, x_next

        _, dad_acc, _ = jax.lax.fori_loop(
            0, n_samples, body_mlp,
            (jnp.ones((1, r), jnp.float32), jnp.zeros((128, r), jnp.float32),
             pe_at(0)),
        )
    elif n_streams == 1:
        def body_mlp(s, carry):
            trans, dad_acc = carry
            a_s = a_ref[pl.ds(s, 1), :]
            da_alpha = c_at(s) * trans + dsig_scr[pl.ds(s, 1), :]
            dad_acc = chain(s, da_alpha, dad_acc)
            return trans * (1.0 - a_s + 1e-10), dad_acc

        _, dad_acc = jax.lax.fori_loop(
            0, n_samples, body_mlp,
            (jnp.ones((1, r), jnp.float32), jnp.zeros((128, r), jnp.float32)),
        )
    else:
        half = n_samples // n_streams

        def body_mlp(s, dad_acc):
            for k in range(n_streams):
                sk = s + k * half
                dad_acc = chain(sk, dsig_scr[pl.ds(sk, 1), :], dad_acc)
            return dad_acc

        dad_acc = jax.lax.fori_loop(
            0, half, body_mlp, jnp.zeros((128, r), jnp.float32)
        )
    dwdx[:] += dot_nt(dad_acc, d_pe.astype(jnp.float32))


def run_variant(variant, r_tile, n_streams, inputs, check_against=None):
    (rays_t, z_vals, params, w_t, a_t, rgb_t, g) = inputs
    dtype = jnp.bfloat16
    n, s = z_vals.shape
    s8 = _round8(s)
    rays8, z_t, _, _, n_pad = _prep(rays_t, z_vals, None, r_tile)
    nt = n + n_pad
    g_rgb, g_depth, g_w = g

    def pad_lanes(x):
        return jnp.pad(x, ((0, 0), (0, nt - x.shape[1])))

    gout = jnp.concatenate(
        [g_rgb.T.astype(jnp.float32), g_depth[None].astype(jnp.float32),
         jnp.zeros((RAY_OUT - 4, n), jnp.float32)], axis=0,
    )
    gout = pad_lanes(gout)
    gw_t = pad_lanes(jnp.pad(g_w.T.astype(jnp.float32), ((0, s8 - s), (0, 0))))
    w_p = pad_lanes(w_t[:, :n]) if w_t.shape[1] != nt else w_t
    a_p = pad_lanes(a_t[:, :n]) if a_t.shape[1] != nt else a_t
    rgb_p = pad_lanes(rgb_t[:, :n]) if rgb_t.shape[1] != nt else rgb_t

    operands = pack_weights_t(params, dtype)
    grid = (nt // r_tile,)

    def tiled(rows):
        return pl.BlockSpec((rows, r_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [tiled(RAY_OUT), tiled(s8), tiled(s8), tiled(s8),
                tiled(3 * s8), tiled(RAY_OUT), tiled(s8)]
    in_specs += _weight_specs(operands)
    w_shapes = [op.shape for op in operands[:14]]
    b_shapes = [op.shape for op in operands[14:]]
    out_shapes = [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes + b_shapes]
    out_specs = [
        pl.BlockSpec(sh, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for sh in w_shapes + b_shapes
    ]
    kernel = functools.partial(
        _exp_bwd_kernel, n_samples=s, cdtype="bfloat16",
        abl=frozenset() if variant in ("base", "two_stream") else frozenset([variant]),  # pe_pipe rides abl but is exact
        n_streams=n_streams,
    )
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((s8, r_tile), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )

    fixed = (z_t, w_p, a_p, rgb_p, gout, gw_t, *operands)

    def fn(r8):
        outs = call(r8, *fixed)
        return outs[0]  # dw1, summed by the timing loop

    if check_against is not None:
        from sinnerf_tpu.ops.fused_mlp_t import _unpack_grads_t

        outs = call(rays8, *fixed)
        got = _unpack_grads_t(outs[:14], outs[14:], params)
        errs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1e-3))),
            got, check_against,
        )
        err = max(jax.tree_util.tree_leaves(errs))
        print(f"  [{variant} r={r_tile} x{n_streams}] max rel err vs production: {err:.2e}")
        # catches transcription errors (O(1) divergence); the margin only
        # absorbs f32 accumulation-order differences at non-production tiles
        assert err < 1e-3, f"variant {variant} diverged from production: {err}"

    dt = time_fn(fn, rays8, iters=10, repeats=3)
    return dt


def main():
    key = jax.random.key(0)
    params = init_nerf_params(key)
    rng = np.random.default_rng(0)
    o = rng.normal(size=(3, N_RAYS)).astype(np.float32) * 0.1
    d = rng.normal(size=(3, N_RAYS)).astype(np.float32)
    rays_t = jnp.asarray(np.concatenate([o, d], axis=0))
    z = np.sort(rng.uniform(2.0, 6.0, size=(N_RAYS, N_SAMPLES)).astype(np.float32), axis=1)
    z_vals = jnp.asarray(z)

    out, w_t, a_t, rgb_t = _run_fwd(params, rays_t, z_vals, None, True, False, "bfloat16")
    jax.block_until_ready(w_t)
    g = (
        jnp.asarray(rng.normal(size=(N_RAYS, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N_RAYS,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N_RAYS, N_SAMPLES)).astype(np.float32) * 0.01),
    )

    # production kernel time (sanity anchor for the `base` copy)
    try:
        t_prod = time_fn(
            lambda r: _frlt_bwd(
                True, False, "bfloat16",
                (params, r, z_vals, None, w_t, a_t, rgb_t), g,
            )[0]["sigma"]["w"],
            rays_t, iters=10, repeats=3,
        )
        print(f"production _frlt_bwd: {t_prod*1e3:.2f} ms")
    except Exception as e:
        print("production timing failed:", e)

    # production grads: the numerics anchor for the bit-exact variants
    # (base / two_stream / pe_pipe must reproduce these, or the ablation
    # table is measuring a kernel that computes something else)
    prod_grads = None
    if os.environ.get("EXP_CHECK", "1") == "1":
        prod_grads = _frlt_bwd(
            True, False, "bfloat16",
            (params, rays_t, z_vals, None, w_t, a_t, rgb_t), g,
        )[0]
        jax.block_until_ready(prod_grads)

    inputs = (rays_t, z_vals, params, w_t, a_t, rgb_t, g)
    results = {}
    default = "base:1024:1,no_db:1024:1,no_mask:1024:1,no_dw:1024:1,mxu_floor:1024:1,two_stream:512:2,two_stream:1024:2"
    spec = os.environ.get("EXP_VARIANTS", default)
    for entry in spec.split(","):
        variant, r_tile, streams = entry.split(":")
        r_tile, streams = int(r_tile), int(streams)
        tag = f"{variant}_r{r_tile}_x{streams}"
        exact = variant in ("base", "two_stream", "pe_pipe")
        try:
            dt = run_variant(
                variant, r_tile, streams, inputs,
                check_against=prod_grads if exact else None,
            )
            results[tag] = dt
            print(f"{tag:24s} {dt*1e3:8.2f} ms")
        except Exception as e:
            print(f"{tag:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
    print(results)


if __name__ == "__main__":
    main()
