"""Packed multi-window attention kernel (Pallas, TPU) for Swin.

Why: Swin-T's window attention runs (49-token, 32-dim) matmuls per window
— at 128x128 MXU tiles that is <15% tile occupancy, and the XLA lowering
materializes the (nB, heads, 49, 49) f32 logits in HBM, runs softmax as a
separate pass, and dispatches thousands of tiny batched matmuls. Measured
cost: 48.6% of the whole Swin DINO step (`scripts/swin_dissect.py`,
docs/performance.md). The reference hits the same shapes on GPU via
torchvision `swin_t` (`main_dino_mc.py:226-229`) where 49x32 fits warp
GEMMs fine — the geometry is hostile specifically to a systolic array.

This kernel packs G windows along the MXU row axis per grid program:
Q/K/V blocks are (G*49, C) and each head's scores are ONE (G*49, G*49)
GEMM instead of G tiny ones. Cross-window pairs are suppressed with an
additive block-diagonal -1e9 mask (iota compare, VMEM-resident — the same
trick the DINO local-crop packing uses, generalized to G segments). The
whole per-program working set (scores, probs) lives in VMEM; HBM traffic
collapses to Q/K/V/O themselves. G trades MXU row fill against G-fold
waste in the masked score/softmax work; callers pick G per geometry
(`pick_group`), tuned on-chip (docs/performance.md r5).

The relative-position bias add and the shift/pad window masks are folded
INTO the score matmul via a rank-ww augmentation: with I_cols[c] =
onehot(c mod ww) and A_h[r] = bias_h[r mod ww, :] + mask[win(r), r mod
ww, :], the term (A_h @ I_cols^T)[r, c] = bias_h[r%ww, c%ww] +
mask[win(r), r%ww, c%ww] — exactly the per-window broadcast the XLA path
does with a (nW, 49, 49) gather+add, but here it rides the MXU inside the
same score pass (contraction 32+49=81 lanes, still one MXU pass).

Backward is a second kernel (custom VJP) that recomputes probabilities in
VMEM and emits dQ, dK, dV plus the relative-bias gradient, which is
recovered per head as I_rows^T @ dS @ I_rows (off-diagonal dS is exactly
zero, so the diagonal-block sum is exact) and accumulated across grid
programs into a (heads, ww, ww) output with a constant index map.

Reference behavior being replaced: torchvision SwinTransformerBlock
attention; our XLA fallback lives in models/swin.py:_window_attention.

Two variants, measured on chip (scripts/swin_kernel_micro.py):

- ``perhead`` (default): loops heads inside the program, one (R, R)
  score GEMM per head. Measured (4-layer-chained cores, v5e):
  stage1 1.39x fwd / 1.32x f+b over the XLA einsum core at G=4,
  stage2 1.13x, stage3 0.86x — the kernel wins where windows are many
  and heads few; models gate it per stage.
- ``stacked``: additionally stacks ALL heads into the same two GEMMs via
  masked block-stacked operands: K' (H*R, C) has K's rows repeated per
  head with lanes outside that head's slice zeroed, so S = Q @ K'^T
  gives every head's scores in one (R, H*R) GEMM, and O = P @ V' (same
  masking) folds all heads' PV products AND the output head-concat into
  one GEMM. Built to test the MXU-issue-count hypothesis; REFUTED by
  measurement — stack construction + row padding costs more than the
  saved issues (stage1 f+b 2.62 vs perhead 2.48 ms; stage2/3 strictly
  worse). Kept with its numbers as the measured dead end.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def pick_group(n_windows: int, n_total: int, target_rows: int = 256,
               ww: int = 49) -> int:
    """Pick the per-program window-pack factor G.

    Constraints: G | n_total (total window count), and either G | nW
    (groups stay inside one image; the mask block is a slice) or nW | G
    (groups span whole images; the mask tiles). Preference: G*ww rows
    close to ``target_rows`` (G-fold masked-softmax waste vs MXU row
    fill — tuned on chip, docs/performance.md r5).
    """
    best, best_cost = 1, None
    for g in range(1, 17):
        if n_total % g:
            continue
        if not (n_windows % g == 0 or g % n_windows == 0):
            continue
        cost = abs(g * ww - target_rows)
        if best_cost is None or cost < best_cost:
            best, best_cost = g, cost
    return best


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _aug_operands(bias_ref, mask_ref, h, G, ww, dt):
    """(A_h, I_cols): rank-ww augmentation operands for the score GEMM."""
    R = G * ww
    bias_h = bias_ref[h]  # (ww, ww) f32
    a = jnp.concatenate([bias_h] * G, axis=0)  # (R, ww)
    if mask_ref is not None:
        a = a + mask_ref[...].reshape(R, ww)
    icols = (_iota2((R, ww), 0) % ww == _iota2((R, ww), 1)).astype(dt)
    return a.astype(dt), icols


def _scores(q_ref, k_ref, bias_ref, mask_ref, h, sl, scale, G, ww, bd):
    qh = q_ref[0][:, sl]
    kh = k_ref[0][:, sl]
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    a, icols = _aug_operands(bias_ref, mask_ref, h, G, ww, qh.dtype)
    s = s + jax.lax.dot_general(
        a, icols, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return s + bd


def _probs(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _block_diag_mask(R, ww):
    return jnp.where(
        _iota2((R, R), 0) // ww == _iota2((R, R), 1) // ww, 0.0, NEG
    ).astype(jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, heads, hd, G,
                ww, stage):
    mask_ref, o_ref = (rest if len(rest) == 2 else (None, rest[0]))
    R = G * ww
    bd = _block_diag_mask(R, ww)
    sls = [slice(h * hd, (h + 1) * hd) for h in range(heads)]
    # Staged phases (all scores -> softmaxes -> PVs) within head chunks of
    # ``stage`` — same Mosaic-overlap trick as ops/pallas/attention.py,
    # chunked so the staged f32 score/prob buffers fit VMEM at large G.
    for c0 in range(0, heads, stage):
        hs = range(c0, min(c0 + stage, heads))
        ss = [_scores(q_ref, k_ref, bias_ref, mask_ref, h, sls[h], scale,
                      G, ww, bd) for h in hs]
        ps = [_probs(s) for s in ss]
        for p, h in zip(ps, hs):
            o_ref[0, :, sls[h]] = jax.lax.dot_general(
                p.astype(q_ref.dtype), v_ref[0][:, sls[h]],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, heads, hd, G,
                ww, stage):
    if len(rest) == 6:
        mask_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
    else:
        do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
        mask_ref = None
    R = G * ww
    bd = _block_diag_mask(R, ww)
    irows = (_iota2((R, ww), 0) % ww == _iota2((R, ww), 1)).astype(q_ref.dtype)
    sls = [slice(h * hd, (h + 1) * hd) for h in range(heads)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for c0 in range(0, heads, stage):
        hs = range(c0, min(c0 + stage, heads))
        ps = [_probs(_scores(q_ref, k_ref, bias_ref, mask_ref, h, sls[h],
                             scale, G, ww, bd)) for h in hs]
        for p, h in zip(ps, hs):
            sl = sls[h]
            q = q_ref[0][:, sl]
            k = k_ref[0][:, sl]
            v = v_ref[0][:, sl]
            do = do_ref[0][:, sl]
            pb = p.astype(q.dtype)
            dv = jax.lax.dot_general(
                pb, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds32 = p * (dp - delta)  # off-diagonal exactly 0 (p=0 there)
            ds = ds32.astype(q.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            # dbias_h = I_rows^T @ dS @ I_rows: exact diag-block sum
            t = jax.lax.dot_general(
                irows, ds, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (ww, R)
            db = jax.lax.dot_general(
                t.astype(q.dtype), irows, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (ww, ww)
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
            dbias_ref[h] += db


def _stage_chunk(heads: int, R: int, bwd: bool = False) -> int:
    """Head chunk size for staged phases: staged f32 score/prob buffers
    capped to fit scoped VMEM (the backward holds ~6 (R, R) f32 buffers
    live per head: S/P, dp, ds32, ds, plus the dq/dk/dv partials)."""
    rp = -(-R // 128) * 128
    per_head = (6 if bwd else 2) * R * rp * 4
    return max(1, min(heads, (4 << 20) // per_head))


def _mask_spec(mask: np.ndarray, nW: int, G: int, ww: int):
    """(mask_array, BlockSpec) for the (G, ww, ww) per-program mask."""
    if G <= nW:
        assert nW % G == 0
        per = nW // G
        arr = jnp.asarray(mask, jnp.float32)
        spec = pl.BlockSpec((G, ww, ww), lambda i: (i % per, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        assert G % nW == 0
        arr = jnp.asarray(np.tile(mask, (G // nW, 1, 1)), jnp.float32)
        spec = pl.BlockSpec((G, ww, ww), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    return arr, spec


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def _packed_window_attention(q, k, v, bias, mask_key, scale, heads, G, ww,
                             interpret):
    out, _ = _pwa_fwd(q, k, v, bias, mask_key, scale, heads, G, ww, interpret)
    return out


# Masks are static numpy constants per (geometry, shift) — passed by key
# into a registry so custom_vjp's nondiff hashing works.
_MASK_REGISTRY = {}


def _register_mask(mask: Optional[np.ndarray]) -> Optional[Tuple]:
    if mask is None:
        return None
    key = (mask.shape, hash(mask.tobytes()))
    _MASK_REGISTRY[key] = mask
    return key


def _pwa_fwd(q, k, v, bias, mask_key, scale, heads, G, ww, interpret):
    nG, R, C = q.shape
    hd = C // heads
    mask = _MASK_REGISTRY[mask_key] if mask_key is not None else None
    kern = functools.partial(
        _fwd_kernel, scale=scale, heads=heads, hd=hd, G=G, ww=ww,
        stage=_stage_chunk(heads, R),
    )
    qkv_spec = pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, ww, ww), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec] * 3 + [bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        nW = mask.shape[0]
        arr, spec = _mask_spec(mask, nW, G, ww)
        in_specs.append(spec)
        args.append(arr)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(nG,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nG * heads * R * R * (2 * hd + ww),
            bytes_accessed=4 * nG * R * C * 2,
            transcendentals=nG * heads * R * R,
        ),
    )(*args)
    return out, (q, k, v, bias)


def _pwa_bwd(mask_key, scale, heads, G, ww, interpret, res, do):
    q, k, v, bias = res
    nG, R, C = q.shape
    hd = C // heads
    mask = _MASK_REGISTRY[mask_key] if mask_key is not None else None
    kern = functools.partial(
        _bwd_kernel, scale=scale, heads=heads, hd=hd, G=G, ww=ww,
        stage=_stage_chunk(heads, R, bwd=True),
    )
    qkv_spec = pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, ww, ww), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec] * 3 + [bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        nW = mask.shape[0]
        arr, spec = _mask_spec(mask, nW, G, ww)
        in_specs.append(spec)
        args.append(arr)
    in_specs.append(qkv_spec)
    args.append(do.astype(q.dtype))
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        grid=(nG,),
        in_specs=in_specs,
        out_specs=[qkv_spec] * 3 + [bias_spec],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * nG * heads * R * R * (2 * hd + ww),
            bytes_accessed=8 * nG * R * C * 2,
            transcendentals=nG * heads * R * R,
        ),
    )(*args)
    return dq, dk, dv, dbias.astype(bias.dtype)


_packed_window_attention.defvjp(_pwa_fwd, _pwa_bwd)


# --------------------------------------------------------------------------
# Head-stacked variant: one score GEMM and one PV GEMM cover ALL heads of a
# chunk. Head blocks live at a 128-aligned stride Rp = pad128(R) along the
# stacked axis so segment slices stay lane-aligned.
# --------------------------------------------------------------------------


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _stack_heads(x, h0, hc, hd, Rp):
    """(R, C) -> (hc*Rp, hc*hd): rows of x (lanes restricted to heads
    [h0, h0+hc)) repeated per head block, zeroed outside that head's
    lane slice and beyond row R of each block."""
    R = x.shape[0]
    xs = x[:, h0 * hd : (h0 + hc) * hd]  # (R, hc*hd)
    xp = jnp.pad(xs, ((0, Rp - R), (0, 0))) if Rp != R else xs
    rep = jnp.concatenate([xp] * hc, axis=0)  # (hc*Rp, hc*hd)
    rowh = _iota2(rep.shape, 0) // Rp
    laneh = _iota2(rep.shape, 1) // hd
    return jnp.where(rowh == laneh, rep, jnp.zeros_like(rep))


def _stacked_scores(q_ref, k_ref, bias_ref, mask_ref, h0, hc, hd, scale,
                    G, ww):
    """(R, hc*Rp) f32 logits for head chunk [h0, h0+hc): head blocks at
    stride Rp along lanes; window-block-diagonal + bias + mask applied."""
    R = q_ref.shape[1]
    Rp = _pad128(R)
    qs = q_ref[0][:, h0 * hd : (h0 + hc) * hd]
    kst = _stack_heads(k_ref[0], h0, hc, hd, Rp)
    s = jax.lax.dot_general(
        qs, kst, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (R, hc*Rp)
    # bias/mask via the rank-ww aux GEMM, all chunk heads at once:
    # A2[:, h*ww:(h+1)*ww] = tile_rows(bias_{h0+h}) (+ window mask), and
    # I2[(h*Rp)+r', h'*ww+m] = [h==h'][r'%ww==m][r'<R] restores the
    # per-head per-window broadcast.
    a_cols = [jnp.concatenate([bias_ref[h0 + h]] * G, axis=0)
              for h in range(hc)]  # each (R, ww)
    a2 = jnp.concatenate(a_cols, axis=1)  # (R, hc*ww)
    if mask_ref is not None:
        m2 = mask_ref[...].reshape(R, ww)
        a2 = a2 + jnp.concatenate([m2] * hc, axis=1)
    shp = (hc * Rp, hc * ww)
    i2 = (
        (_iota2(shp, 0) // Rp == _iota2(shp, 1) // ww)
        & ((_iota2(shp, 0) % Rp) % ww == _iota2(shp, 1) % ww)
        & (_iota2(shp, 0) % Rp < R)
    ).astype(q_ref.dtype)
    s = s + jax.lax.dot_general(
        a2.astype(q_ref.dtype), i2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # window block-diagonal (also kills the Rp-R pad columns)
    shp = (R, hc * Rp)
    cr = _iota2(shp, 1) % Rp
    bd = jnp.where((_iota2(shp, 0) // ww == cr // ww) & (cr < R), 0.0, NEG)
    return s + bd


def _seg_softmax(s, hc, Rp):
    """Row softmax over each head's Rp-lane segment (lane-aligned
    slices); returns f32 probabilities, same shape."""
    outs = []
    for h in range(hc):
        seg = s[:, h * Rp : (h + 1) * Rp]
        seg = seg - jnp.max(seg, axis=-1, keepdims=True)
        e = jnp.exp(seg)
        outs.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return jnp.concatenate(outs, axis=1)


def _fwd_stacked_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, heads,
                        hd, G, ww, hc):
    mask_ref, o_ref = (rest if len(rest) == 2 else (None, rest[0]))
    R = q_ref.shape[1]
    Rp = _pad128(R)
    for h0 in range(0, heads, hc):
        c = min(hc, heads - h0)
        s = _stacked_scores(q_ref, k_ref, bias_ref, mask_ref, h0, c, hd,
                            scale, G, ww)
        p = _seg_softmax(s, c, Rp).astype(q_ref.dtype)
        vst = _stack_heads(v_ref[0], h0, c, hd, Rp)
        o_ref[0, :, h0 * hd : (h0 + c) * hd] = jax.lax.dot_general(
            p, vst, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_stacked_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, heads,
                        hd, G, ww, hc):
    if len(rest) == 6:
        mask_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
    else:
        do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
        mask_ref = None
    R = q_ref.shape[1]
    Rp = _pad128(R)
    irows = (
        (_iota2((Rp, ww), 0) % ww == _iota2((Rp, ww), 1))
        & (_iota2((Rp, ww), 0) < R)
    ).astype(q_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h0 in range(0, heads, hc):
        c = min(hc, heads - h0)
        lanes = slice(h0 * hd, (h0 + c) * hd)
        s = _stacked_scores(q_ref, k_ref, bias_ref, mask_ref, h0, c, hd,
                            scale, G, ww)
        p = _seg_softmax(s, c, Rp)  # f32 (R, c*Rp)
        vst = _stack_heads(v_ref[0], h0, c, hd, Rp)
        kst = _stack_heads(k_ref[0], h0, c, hd, Rp)
        do = do_ref[0][:, lanes]
        pb = p.astype(q_ref.dtype)
        # dVstack = P^T dO; extract each head's (R, hd) block
        dvst = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (c*Rp, c*hd)
        dv_ref[0, :, lanes] = jnp.concatenate(
            [dvst[h * Rp : h * Rp + R, h * hd : (h + 1) * hd]
             for h in range(c)], axis=1,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, vst, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, c*Rp)
        segs = []
        for h in range(c):
            sl = slice(h * Rp, (h + 1) * Rp)
            ph, dph = p[:, sl], dp[:, sl]
            delta = jnp.sum(ph * dph, axis=-1, keepdims=True)
            segs.append(ph * (dph - delta))
        ds32 = jnp.concatenate(segs, axis=1)  # (R, c*Rp), 0 on pads
        ds = ds32.astype(q_ref.dtype)
        dq_ref[0, :, lanes] = (
            jax.lax.dot_general(
                ds, kst, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        ).astype(dq_ref.dtype)
        dkst = jax.lax.dot_general(
            ds, q_ref[0][:, lanes], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (c*Rp, c*hd)
        dk_ref[0, :, lanes] = (
            jnp.concatenate(
                [dkst[h * Rp : h * Rp + R, h * hd : (h + 1) * hd]
                 for h in range(c)], axis=1,
            ) * scale
        ).astype(dk_ref.dtype)
        # dbias_h = I_rows^T dS_h I_rows (diag-block sum; off-diag dS = 0)
        t = jax.lax.dot_general(
            irows[:R], ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ww, c*Rp)
        for h in range(c):
            db = jax.lax.dot_general(
                t[:, h * Rp : (h + 1) * Rp].astype(q_ref.dtype), irows,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbias_ref[h0 + h] += db


def _head_chunk(heads: int, R: int, hd: int) -> int:
    """Heads stacked per GEMM: bounded by stacked-lane width (MXU output
    tile streaming) and the (hc*Rp, hc*hd) stack buffers' VMEM."""
    Rp = _pad128(R)
    best = 1
    for hc in range(1, heads + 1):
        lanes = hc * Rp
        stack_bytes = 2 * (hc * Rp) * (hc * hd) * 2  # k/v stacks, bf16
        score_bytes = 3 * R * lanes * 4  # s, p, ds
        if lanes <= 2048 and stack_bytes + score_bytes <= (9 << 20):
            best = hc
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _packed_window_attention_stacked(q, k, v, bias, mask_key, scale, heads,
                                     G, ww, interpret):
    out, _ = _pwas_fwd(q, k, v, bias, mask_key, scale, heads, G, ww,
                       interpret)
    return out


def _pwas_specs(R, C, heads, ww, mask):
    qkv_spec = pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, ww, ww), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec] * 3 + [bias_spec]
    return qkv_spec, bias_spec, in_specs


def _pwas_fwd(q, k, v, bias, mask_key, scale, heads, G, ww, interpret):
    nG, R, C = q.shape
    hd = C // heads
    mask = _MASK_REGISTRY[mask_key] if mask_key is not None else None
    kern = functools.partial(
        _fwd_stacked_kernel, scale=scale, heads=heads, hd=hd, G=G, ww=ww,
        hc=_head_chunk(heads, R, hd),
    )
    qkv_spec, _, in_specs = _pwas_specs(R, C, heads, ww, mask)
    args = [q, k, v, bias]
    if mask is not None:
        arr, spec = _mask_spec(mask, mask.shape[0], G, ww)
        in_specs.append(spec)
        args.append(arr)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(nG,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nG * heads * R * _pad128(R) * (2 * hd + ww),
            bytes_accessed=4 * nG * R * C * 2,
            transcendentals=nG * heads * R * _pad128(R),
        ),
    )(*args)
    return out, (q, k, v, bias)


def _pwas_bwd(mask_key, scale, heads, G, ww, interpret, res, do):
    q, k, v, bias = res
    nG, R, C = q.shape
    hd = C // heads
    mask = _MASK_REGISTRY[mask_key] if mask_key is not None else None
    kern = functools.partial(
        _bwd_stacked_kernel, scale=scale, heads=heads, hd=hd, G=G, ww=ww,
        hc=_head_chunk(heads, R, hd),
    )
    qkv_spec, bias_spec, in_specs = _pwas_specs(R, C, heads, ww, mask)
    args = [q, k, v, bias]
    if mask is not None:
        arr, spec = _mask_spec(mask, mask.shape[0], G, ww)
        in_specs.append(spec)
        args.append(arr)
    in_specs.append(qkv_spec)
    args.append(do.astype(q.dtype))
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        grid=(nG,),
        in_specs=in_specs,
        out_specs=[qkv_spec] * 3 + [bias_spec],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * nG * heads * R * _pad128(R) * (2 * hd + ww),
            bytes_accessed=8 * nG * R * C * 2,
            transcendentals=nG * heads * R * _pad128(R),
        ),
    )(*args)
    return dq, dk, dv, dbias.astype(bias.dtype)


_packed_window_attention_stacked.defvjp(_pwas_fwd, _pwas_bwd)


def packed_window_attention(
    q: jnp.ndarray,  # (nB, ww, C)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (heads, ww, ww) f32
    mask: Optional[np.ndarray],  # (nW, ww, ww) static, or None
    heads: int,
    n_windows: int,
    group: Optional[int] = None,
    interpret: bool = False,
    variant: str = "perhead",
) -> jnp.ndarray:
    """Window attention over pre-projected q/k/v, G windows per program.

    Exactly equivalent (modulo bf16 rounding) to per-window
    softmax(QK^T/sqrt(hd) + bias + mask) V — the XLA fallback in
    models/swin.py:_window_attention. ``variant``: 'perhead' (default —
    one score GEMM per head; measured fastest, see module docstring) |
    'stacked' (heads share GEMMs; kept with its measurements as the
    refuted second-generation design).
    """
    nB, ww, C = q.shape
    hd = C // heads
    G = group or pick_group(n_windows, nB, ww=ww)
    assert nB % G == 0
    if mask is not None and mask.shape[1:] != (ww, ww):
        # pad-only masks broadcast over queries as (nW, 1, ww)
        mask = np.ascontiguousarray(
            np.broadcast_to(mask, (mask.shape[0], ww, ww))
        )
    wp = ww
    if variant == "stacked":
        # Pad windows to a 16-token multiple: the stacked kernel's row
        # concats happen at (G*ww)-row offsets, and Mosaic requires bf16
        # sublane (16) alignment there. Padded KEYS are masked via NEG
        # columns appended to the bias table; padded QUERY rows produce
        # garbage that is sliced off below (their cotangent is zero).
        wp = -(-ww // 16) * 16
        if wp != ww:
            pad_tok = ((0, 0), (0, wp - ww), (0, 0))
            q = jnp.pad(q, pad_tok)
            k = jnp.pad(k, pad_tok)
            v = jnp.pad(v, pad_tok)
            bias = jnp.pad(bias, ((0, 0), (0, wp - ww), (0, wp - ww)),
                           constant_values=0.0)
            bias = bias + jnp.asarray(
                np.pad(np.zeros((ww,), np.float32), (0, wp - ww),
                       constant_values=NEG)
            )[None, None, :]
            if mask is not None:
                mask = np.pad(
                    mask, ((0, 0), (0, wp - ww), (0, wp - ww))
                )
    mask_key = _register_mask(mask)
    shp = (nB // G, G * wp, C)
    fn = (_packed_window_attention_stacked if variant == "stacked"
          else _packed_window_attention)
    out = fn(
        q.reshape(shp), k.reshape(shp), v.reshape(shp), bias, mask_key,
        float(1.0 / np.sqrt(hd)), heads, G, wp, interpret,
    )
    out = out.reshape(nB, wp, C)
    return out[:, :ww, :] if wp != ww else out
