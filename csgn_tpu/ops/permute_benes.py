"""Permutation as a Beneš network of word-parallel delta swaps.

The gather path (`core.permute_chunks`) unpacks to a byte-per-bit tensor —
8-32x traffic amplification.  This module stays in the packed uint32 domain:
any permutation of N = 2^m bit positions decomposes into 2m-1 "delta swap"
stages (deltas 1, 2, ..., N/2, ..., 2, 1), each a masked exchange of bit
pairs at distance delta:

  * delta < 32: in-word —  t = (X ^ (X << delta)) & M;  X ^= t ^ (t >> delta)
  * delta >= 32: across words at the same in-word shift — row rolls + mask.

Every stage is a handful of elementwise uint32 ops over the whole [Wp, C]
tensor; XLA fuses the 21 stages into a few bandwidth-bound passes.  Routing
(control-bit computation) runs once per permutation on the host in
O(N log N) (the classic looping algorithm) and is cached on the Permutation
object by callers.

Semantics: `apply_benes(X, plan)` computes out bit i = in bit perm[i] for
every chunk — identical to `core.permute_chunks` (tests enforce equality).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "BenesPlan",
    "StackedPlans",
    "build_plan",
    "apply_benes",
    "apply_benes_batch",
    "apply_benes_batch_pallas",
    "apply_benes_decrypt_pallas",
    "apply_benes_pallas",
    "stack_plans",
    "BENES_PALLAS_MIN_C",
]

# Crossover to the fused Pallas kernel.  r5 device-chained probe
# (.tpuq/perm_crossover_r5.out, fori_loop x512 so tunnel RTT cancels):
# Pallas wins at every size measured (48.7 vs 50.6 us/op at C=1024, 90 vs
# 152 at 32768) — both paths are launch-overhead-bound below ~2048, where
# the difference is noise and XLA's fusible form is worth keeping.
BENES_PALLAS_MIN_C = 2048


def _max_block_c(wp: int) -> int:
    """Largest safe chunk-block width for the fused kernels.

    The stage chain keeps several (wp, bc) u32 working buffers live on the
    scoped-VMEM stack (Mosaic allocates the per-stage temporaries there);
    block_c=16384 at wp=64 compiles to a 25 MB scoped allocation vs the
    16 MB limit (measured r4).  2 MB per working buffer keeps the stack
    comfortably under the limit at every wp."""
    return max(128, (2 << 20) // (wp * 4))


def _route(perm: np.ndarray) -> list[tuple[int, np.ndarray]]:
    """Beneš looping algorithm: stage list [(delta, swap_mask_bool[N])].

    `perm` is gather form: out[i] = in[perm[i]].  A stage's mask marks
    positions i (with (i & delta) == 0) whose pair (i, i+delta) swaps.
    """
    n = len(perm)
    assert n & (n - 1) == 0
    if n == 1:
        return []
    if n == 2:
        return [(1, np.array([perm[0] == 1, False]))]

    inv = np.argsort(perm)
    m = n // 2
    halves = np.full(n, -1, dtype=np.int8)  # which half each OUTPUT rides

    for start in range(n):
        if halves[start] != -1:
            continue
        p, h = start, 0
        while halves[p] == -1:
            halves[p] = h
            halves[p ^ 1] = 1 - h
            # the element feeding out[p^1] travels in half 1-h; its input
            # partner must take half h, surfacing at output inv[source^1].
            src = perm[p ^ 1]
            p = int(inv[src ^ 1])
            # h stays: that output must ride half h.

    pair_idx = np.arange(m)
    lcontrol = halves[2 * pair_idx] != 0            # swap at output pair i
    fcontrol = halves[inv[2 * pair_idx]] != 0       # swap at input pair j

    # Sub-permutations realized by the inner networks (top = even slots).
    out_slot_top = 2 * pair_idx + lcontrol.astype(int)
    out_slot_bot = 2 * pair_idx + (1 - lcontrol.astype(int))
    top = perm[out_slot_top] // 2
    bot = perm[out_slot_bot] // 2

    first_mask = np.zeros(n, dtype=bool)
    first_mask[2 * pair_idx[fcontrol]] = True
    last_mask = np.zeros(n, dtype=bool)
    last_mask[2 * pair_idx[lcontrol]] = True

    sub_top = _route(top)
    sub_bot = _route(bot)
    mid = []
    for (dt, mt), (db, mb) in zip(sub_top, sub_bot):
        assert dt == db
        mask = np.zeros(n, dtype=bool)
        mask[0::2] = mt
        mask[1::2] = mb
        mid.append((2 * dt, mask))
    return [(1, first_mask)] + mid + [(1, last_mask)]


def _pack_mask(mask: np.ndarray, wp: int) -> np.ndarray:
    """bool[N] -> uint32[wp] in the MSB-first layout."""
    n = len(mask)
    out = np.zeros(wp, dtype=np.uint32)
    idx = np.nonzero(mask)[0]
    np.bitwise_or.at(out, idx // 32, (np.uint32(1) << (31 - idx % 32).astype(np.uint32)))
    return out


@dataclasses.dataclass(frozen=True)
class BenesPlan:
    """Precomputed routing for one permutation: per-stage (delta, packed mask).

    `rows` is the number of leading word-rows each stage must process (a
    multiple of 8, ≤ words_pad): payload bits enter the padded network in the
    first ceil(n/32) words and can only spread by the stage's word radius per
    cross-word stage (symmetrically contracting toward the output).  Mask
    bits outside the payload reach are zeroed at build time — those switches
    only ever exchanged zero padding, so dropping them is value-neutral and
    lets the kernel skip the dead sublanes (a ~25% op-count cut at n=1247,
    where only 39 of 64 padded words carry payload at the network edges).
    """

    n: int                      # logical bit count
    n_pad: int                  # power-of-two network size
    deltas: tuple[int, ...]
    masks: np.ndarray           # uint32[stages, n_pad/32]
    rows: tuple[int, ...] = ()  # per-stage processed row count (8-aligned)

    @property
    def words_pad(self) -> int:
        return self.n_pad // 32


def _payload_rows(n: int, n_pad: int, deltas: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray]:
    """Per-stage payload-row bounds.

    Returns (pb, rows): pb[s] = bound on word-rows that may hold payload
    BEFORE stage s (mask rows ≥ pb[s] are value-neutral and get zeroed);
    rows[s] = 8-aligned row count the kernel must process (pb + roll radius).
    """
    wp = n_pad // 32
    w_pay = -(-n // 32)
    s_cnt = len(deltas)
    radii = [0 if d < 32 else d // 32 for d in deltas]
    fwd = np.empty(s_cnt + 1, np.int64)
    fwd[0] = w_pay
    for s, r in enumerate(radii):
        fwd[s + 1] = min(wp, fwd[s] + r)
    bwd = np.empty(s_cnt + 1, np.int64)
    bwd[s_cnt] = w_pay
    for s in range(s_cnt - 1, -1, -1):
        bwd[s] = min(wp, bwd[s + 1] + radii[s])
    pb = np.minimum(fwd[:-1], bwd[:-1])
    rows = np.minimum(wp, -(-(pb + radii) // 8) * 8)
    return pb, rows


def build_plan(perm: np.ndarray, n: int) -> BenesPlan:
    """Route `perm` (gather form, length n) into a delta-swap plan."""
    perm = np.asarray(perm, dtype=np.int64)
    n_pad = 1 << max(5, int(np.ceil(np.log2(max(n, 2)))))
    full = np.concatenate([perm, np.arange(n, n_pad)])  # identity on padding
    stages = _route(full)
    wp = n_pad // 32
    deltas = tuple(int(d) for d, _ in stages)
    masks = np.stack([_pack_mask(m, wp) for _, m in stages])
    pb, rows = _payload_rows(n, n_pad, deltas)
    for s in range(len(deltas)):
        masks[s, pb[s]:] = 0  # value-neutral switches beyond payload reach
    return BenesPlan(n=n, n_pad=n_pad, deltas=deltas, masks=masks,
                     rows=tuple(int(r) for r in rows))


def apply_benes(words: jax.Array, plan: BenesPlan) -> jax.Array:
    """Apply the planned permutation to packed chunks uint32[..., W, C].

    W may differ from the network's word count: smaller W zero-pads the rows
    and slices back (padding bits are zero and identity-routed); larger W
    (n < 32 contexts, where words32 = 2 > words_pad = 1) drops the trailing
    rows through the network — they hold bits >= n_pad >= n, zero in
    canonical form — and restores them as zeros.  Canonical form is
    preserved either way.
    """
    w = words.shape[-2]
    wp = plan.words_pad
    x = jnp.asarray(words).astype(jnp.uint32)
    if wp > w:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, wp - w), (0, 0)]
        x = jnp.pad(x, pad)
    elif wp < w:
        x = x[..., :wp, :]

    for delta, mask in zip(plan.deltas, plan.masks):
        if isinstance(mask, np.ndarray) and not mask.any():
            # All-zero mask = identity stage: free skip for structured perms.
            # (Guarded: dispatch.permute_decrypt traces masks as jit args.)
            continue
        m = jnp.asarray(mask)[..., :, None]
        if delta < 32:
            d = jnp.uint32(delta)
            t = (x ^ (x << d)) & m
            x = x ^ t ^ (t >> d)
        else:
            r = delta // 32
            t = (x ^ jnp.roll(x, -r, axis=-2)) & m
            x = x ^ t ^ jnp.roll(t, r, axis=-2)

    if wp < w:  # restore the dropped (canonical-zero) trailing rows
        pad = [(0, 0)] * (x.ndim - 2) + [(0, w - wp), (0, 0)]
        return jnp.pad(x, pad)
    return x[..., :w, :]


@dataclasses.dataclass(frozen=True)
class StackedPlans:
    """k same-size Beneš plans as one tensor: all networks on the same n_pad
    share the delta schedule AND the live row windows (both derive from
    (n, n_pad, deltas) only — see `_payload_rows`); only the per-stage masks
    differ, so k permutations batch into ``masks uint32[k, S, WP]``."""

    n: int
    n_pad: int
    deltas: tuple[int, ...]
    masks: np.ndarray           # uint32[k, stages, n_pad/32]
    rows: tuple[int, ...]

    @property
    def k(self) -> int:
        return self.masks.shape[0]

    @property
    def words_pad(self) -> int:
        return self.n_pad // 32


def stack_plans(plans: list[BenesPlan]) -> StackedPlans:
    """Stack k same-(n, n_pad) plans into a `StackedPlans`."""
    if not plans:
        raise ValueError("no plans")
    p0 = plans[0]
    for p in plans[1:]:
        if p.n_pad != p0.n_pad or p.n != p0.n:
            raise ValueError("plans must share n and n_pad")
    rows = p0.rows if len(p0.rows) == len(p0.deltas) else (p0.words_pad,) * len(p0.deltas)
    return StackedPlans(
        n=p0.n, n_pad=p0.n_pad, deltas=p0.deltas,
        masks=np.stack([p.masks for p in plans]), rows=rows,
    )


def apply_benes_batch(words: jax.Array, stacked: StackedPlans) -> jax.Array:
    """Apply k DIFFERENT permutations to k ciphertexts in one computation
    (XLA delta-swap path; each stage materializes to HBM).

    words: uint32[k, W, C]; batch element i gets permutation i — the
    key-rotation-fleet pattern (e.g. re-randomizing many ciphertexts under
    distinct transforms at once).  `apply_benes_batch_pallas` is the fused
    TPU path at scale.
    """
    k, w, c = words.shape
    wp = stacked.words_pad
    x = jnp.asarray(words).astype(jnp.uint32)
    if wp > w:
        x = jnp.pad(x, ((0, 0), (0, wp - w), (0, 0)))
    elif wp < w:  # n < 32: trailing rows are canonical-zero (see apply_benes)
        x = x[:, :wp, :]
    m_all = jnp.asarray(stacked.masks)

    for s, delta in enumerate(stacked.deltas):
        if isinstance(stacked.masks, np.ndarray) and not stacked.masks[:, s].any():
            continue  # identity stage across ALL k plans
        m = m_all[:, s, :, None]                      # [k, WP, 1]
        if delta < 32:
            d = jnp.uint32(delta)
            t = (x ^ (x << d)) & m
            x = x ^ t ^ (t >> d)
        else:
            r = delta // 32
            t = (x ^ jnp.roll(x, -r, axis=-2)) & m
            x = x ^ t ^ jnp.roll(t, r, axis=-2)
    if wp < w:
        return jnp.pad(x, ((0, 0), (0, w - wp), (0, 0)))
    return x[:, :w, :]


def apply_benes_decrypt_pallas(
    words: jax.Array,
    plan: BenesPlan,
    mask: jax.Array,
    *,
    block_c: int = 1024,
    return_count: bool = False,
):
    """Fused Beneš + decrypt: ``(permuted [W, C], parity)`` in ONE pass.

    The permute→decrypt pipeline (reference tests/timings.cpp:56-66: permute
    the ciphertext, decrypt under the permuted key) staged costs the
    permutation's read+write plus a full re-read of the permuted payload.
    This kernel computes each output block's eq-all match count against the
    (permuted-key) mask while the block is still in VMEM — the decrypt read
    disappears, for ~3 extra VPU ops/element on a VPU-bound kernel.

    The mask must be the key matching the OUTPUT (for a key-transform
    workflow: `sk.apply_permutation(p).mask`).  ``return_count=True`` emits
    the raw int32 count (the psum-able form for sharded use).  Bit-exact to
    `apply_benes` + `core.decrypt_parity`.
    """
    w, c = words.shape
    wp = plan.words_pad
    bc = min(block_c, _max_block_c(wp), max(128, c))
    cp = -(-c // bc) * bc
    x = jnp.asarray(words).astype(jnp.uint32)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c)))
    masks = jnp.asarray(plan.masks)
    mask_col = jnp.asarray(mask).reshape(w, 1)
    deltas, rows, stage_on, w_net = _plan_static(plan, w)
    n_stages = len(deltas)

    def kern(m_ref, dk_ref, x_ref, o_ref, p_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc_ref[0] = 0

        xw, live = _stage_chain(
            x_ref[0:w_net], w_net,
            lambda s: m_ref[s].reshape(wp, 1),
            deltas, rows, stage_on,
        )
        _store_out(o_ref, xw, live, w)
        # Decrypt accumulation on the still-resident block.  Rows beyond the
        # overlap of the window and the key mask contribute trivially: window
        # rows past the mask compare against a zero mask row (always match),
        # mask rows past the window compare zero payload against a zero mask
        # row (mask bits < n < live window reach), so the eq-all over the
        # overlap is the full eq-all.
        k = min(w, live)
        dk = dk_ref[0:k]
        matches = jnp.all((xw[0:k] & dk) == dk, axis=0)
        acc_ref[0] += jnp.sum(matches.astype(jnp.int32))

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            p_ref[0] = acc_ref[0]

    interpret = jax.default_backend() != "tpu"
    vma = getattr(jax.typeof(x), "vma", frozenset()) | getattr(
        jax.typeof(masks), "vma", frozenset()
    ) | getattr(jax.typeof(mask_col), "vma", frozenset())
    out, cnt = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((w, cp), jnp.uint32, vma=vma),
            jax.ShapeDtypeStruct((1,), jnp.int32, vma=vma),
        ],
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((n_stages, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bc), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((w, bc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(masks, mask_col, x)
    if cp != c:
        out = out[:, :c]
    if return_count:
        return out, cnt[0]
    return out, (cnt[0] & 1).astype(jnp.uint32)


def apply_benes_batch_pallas(
    words: jax.Array, stacked: StackedPlans, *, block_c: int = 1024
) -> jax.Array:
    """Fused k-permutation Beneš on TPU: uint32[k, W, C] -> same, plan i
    applied to batch element i, all stages per VMEM-resident block.

    Same structure as `apply_benes_pallas` with a leading batch grid
    dimension: grid (k, C/block_c); each step loads element ik's chunk block
    and plan ik's mask stack, runs all 2m-1 stages on the plan-shared live
    row windows, and writes the block once — one HBM read+write per element
    regardless of stage count, vs 2m-1 round trips for the XLA path.
    """
    k, w, c = words.shape
    wp = stacked.words_pad
    bc = min(block_c, _max_block_c(wp), max(128, c))
    cp = -(-c // bc) * bc
    x = jnp.asarray(words).astype(jnp.uint32)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c)))
    masks = jnp.asarray(stacked.masks)
    deltas, rows, stage_on, w_net = _plan_static(stacked, w)
    n_stages = len(deltas)

    def kern(m_ref, x_ref, o_ref):
        xw, live = _stage_chain(
            x_ref[0, 0:w_net], w_net,
            lambda s: m_ref[0, s].reshape(wp, 1),
            deltas, rows, stage_on,
        )
        _store_out(o_ref.at[0], xw, live, w)

    interpret = jax.default_backend() != "tpu"
    vma = getattr(jax.typeof(x), "vma", frozenset()) | getattr(
        jax.typeof(masks), "vma", frozenset()
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, w, cp), jnp.uint32, vma=vma),
        grid=(k, cp // bc),
        in_specs=[
            pl.BlockSpec(
                (1, n_stages, wp), lambda ik, ic: (ik, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, w, bc), lambda ik, ic: (ik, 0, ic), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, w, bc), lambda ik, ic: (ik, 0, ic), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(masks, x)
    return out if cp == c else out[:, :, :c]


# ---------------------------------------------------------------------------
# Pallas-fused application: all stages per VMEM block, one HBM read+write.
#
# The kernels read and write the RAW [W, C] payload — no HBM-side row padding
# to words_pad.  The r4 kernels padded rows 40 -> 64 with jnp.pad before the
# pallas_call and sliced back after; in a chained pipeline XLA fuses the
# slice+pad between calls into a full masking pass over the tensor (~0.5 ms
# at 2^20 chunks — measured r5, artifacts/perm_study_r5.out), and the kernel
# itself moved 64/40 = 1.6x the payload bytes.  Row padding is free INSIDE
# the kernel: the stage chain already grows/shrinks its live row window per
# stage, so the window simply starts at the input's W rows.
# ---------------------------------------------------------------------------


def _stage_chain(x, live, m_at, deltas, rows, stage_on):
    """Run the delta-swap chain on a live-row window; returns (x, live).

    `x` is a (live, bc) u32 array; `m_at(s)` yields stage s's packed mask as
    a (wp, 1) column.  Rows outside the window are provably zero (payload
    reach — see `BenesPlan.rows`), so the window grows with constant zeros
    and shrinks by slicing.
    """
    for s, delta in enumerate(deltas):
        if not stage_on[s]:
            continue  # all-zero mask: identity stage, no VPU work
        rs = rows[s]
        if rs > live:  # grow the window with known-zero rows
            x = jnp.concatenate(
                [x, jnp.zeros((rs - live, x.shape[1]), jnp.uint32)], axis=0
            )
        elif rs < live:  # rows beyond rs are provably zero: drop them
            x = x[0:rs]
        live = rs
        m = m_at(s)[0:rs]
        if delta < 32:
            d = jnp.uint32(delta)
            t = (x ^ (x << d)) & m
            x = x ^ t ^ (t >> d)
        else:
            r = delta // 32
            t = (x ^ pltpu.roll(x, rs - r, axis=0)) & m
            x = x ^ t ^ pltpu.roll(t, r, axis=0)
    return x, live


def _plan_static(plan, w: int):
    """Shared kernel prep: (deltas, rows, stage_on, w_net) for a plan or a
    `StackedPlans` (stage s is ON if any of the k plans has a live mask).

    `w_net` is the input row count the network touches: rows >= words_pad
    hold bits >= n_pad >= n, zero in canonical form (w > wp only for n < 32
    contexts, where words32 = 2 > wp = 1).
    """
    n_stages = len(plan.deltas)
    rows = plan.rows if len(plan.rows) == n_stages else (plan.words_pad,) * n_stages
    if isinstance(plan.masks, np.ndarray):
        # BenesPlan masks are [S, WP]; StackedPlans are [k, S, WP] — reduce
        # over every axis except the stage axis.
        stage_axis = plan.masks.ndim - 2
        alive = plan.masks.any(axis=tuple(
            ax for ax in range(plan.masks.ndim) if ax != stage_axis
        ))
        stage_on = tuple(bool(a) for a in alive)
    else:
        stage_on = (True,) * n_stages
    return plan.deltas, rows, stage_on, min(w, plan.words_pad)


def _store_out(o_ref, x, live, w):
    """Write the final window back to a W-row output block (rows beyond the
    window are provably zero; rows beyond wp never entered the network and
    are zero in canonical inputs)."""
    if live >= w:
        o_ref[0:w] = x[0:w]
    else:
        o_ref[0:live] = x
        o_ref[live:w] = jnp.zeros((w - live, x.shape[1]), jnp.uint32)


def apply_benes_pallas(words: jax.Array, plan: BenesPlan, *, block_c: int = 1024) -> jax.Array:
    """Fused Beneš on TPU: uint32[W, C] -> same, all 2m-1 stages applied while
    each chunk block sits in VMEM.

    The XLA path materializes every stage to HBM (21 round trips); this
    kernel reads and writes each chunk ONCE — at the payload's W rows, with
    no HBM-side row padding (r5; see module note above) — and is
    VPU-compute-bound, so each stage runs only on the plan's live row window
    (`BenesPlan.rows`), and all-zero-mask stages are skipped entirely
    (structured perms).  block_c=1024 is the steady within-job winner (r5
    sweeps, artifacts/perm_study_r5.out + perm_sweep2_r5.out; bench.py
    auto-tunes {1024, 2048}), clamped to the scoped-VMEM-safe
    `_max_block_c(wp)`.  The chunk axis is padded to a block multiple only
    when C % block_c != 0 (zero chunks permute to zero, canonical).
    """
    w, c = words.shape
    wp = plan.words_pad
    bc = min(block_c, _max_block_c(wp), max(128, c))
    cp = -(-c // bc) * bc
    x = jnp.asarray(words).astype(jnp.uint32)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c)))
    masks = jnp.asarray(plan.masks)
    deltas, rows, stage_on, w_net = _plan_static(plan, w)
    n_stages = len(deltas)

    def kern(m_ref, x_ref, o_ref):
        # Rows >= w_net are canonical-zero; the window starts at the payload.
        xw, live = _stage_chain(
            x_ref[0:w_net], w_net,
            lambda s: m_ref[s].reshape(wp, 1),
            deltas, rows, stage_on,
        )
        _store_out(o_ref, xw, live, w)

    interpret = jax.default_backend() != "tpu"
    # vma propagation: required when called inside shard_map (check_vma).
    vma = getattr(jax.typeof(x), "vma", frozenset()) | getattr(
        jax.typeof(masks), "vma", frozenset()
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((w, cp), jnp.uint32, vma=vma),
        grid=(cp // bc,),
        in_specs=[
            pl.BlockSpec((n_stages, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bc), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w, bc), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(masks, x)
    return out if cp == c else out[:, :c]
