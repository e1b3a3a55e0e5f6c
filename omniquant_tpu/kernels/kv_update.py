"""O(tokens-written) KV-cache updates (Pallas).

XLA lowers the decode step's per-slot cache write
``cache.at[b_idx, :, lengths, :].set(new)`` to a scatter that materializes a
full copy of the cache buffer — measured 1.9 ms per scatter at
(32, 32, 256, 128) bf16 and 5.7 ms at (8, 32, 2048, 128) on v5e, i.e. the
scatters (2 per layer × 32 layers) dominate the whole decode step. These
kernels instead DMA exactly the new rows into the aliased cache buffer:
per (slot) grid cell one async copy of (n_kv, hd) bytes, with
``input_output_aliases`` making the rest of the buffer zero-cost.

Replaces (TPU-native redesign): no reference counterpart — the reference
has no serving engine (its deployment path is MLC-LLM, README.md:138-170);
this is the cache-write half of the continuous-batching decode step.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _write_kernel(kinds: tuple, B: int, len_ref, *refs):
    """refs = (lens_vmem, new_0.., cache_0.., out_0.., scratch_0.., sem).

    A 1-row slice of the (8, 128)-tiled (S, D) dims can't be DMA'd directly
    (Mosaic requires tile-aligned slice shapes), so for each slot we
    read-modify-write the aligned tile containing the target position:
    DMA tile in -> vector-select the new row -> DMA tile out. The 8x write
    amplification on a (H, 8, D) tile is noise next to the full-buffer
    copy XLA's scatter was doing.

    A SINGLE grid cell issues every slot's DMAs (semaphore (n, B)) so the
    2·n·B transfers overlap; a per-slot grid serialized the ~15 us DMA
    latency into ~1 ms per cache (TPU grid cells run sequentially).

    kinds[i]: "rows" — cache (B, H, S, D), one D-row per position; RMW the
              8-sublane tile of dim 2.
              "flat" — cache (B, H, s8, 128), one scalar per position at
              (pos//128, pos%128); RMW the (8, 128) tile of dims (2, 3).
    """
    n_caches = len(kinds)
    lens_vmem = refs[0]
    news = refs[1 : 1 + n_caches]
    caches = refs[1 + n_caches : 1 + 2 * n_caches]
    outs = refs[1 + 2 * n_caches : 1 + 3 * n_caches]
    scratches = refs[1 + 3 * n_caches : 1 + 4 * n_caches]
    sem = refs[-1]

    def tile_slice(ref, i, b):
        pos = len_ref[b]
        if kinds[i] == "rows":
            pa = (pos // 8) * 8
            return ref.at[pl.ds(b, 1), :, pl.ds(pa, 8), :]
        sa = (pos // 128 // 8) * 8
        return ref.at[pl.ds(b, 1), :, pl.ds(sa, 8), :]

    def scr_slice(i, b):
        return scratches[i].at[pl.ds(b, 1)]

    for i in range(n_caches):
        for b in range(B):
            pltpu.make_async_copy(
                tile_slice(caches[i], i, b), scr_slice(i, b),
                sem.at[i, b]).start()
    for i in range(n_caches):
        for b in range(B):
            pltpu.make_async_copy(
                tile_slice(caches[i], i, b), scr_slice(i, b),
                sem.at[i, b]).wait()
    pos_v = lens_vmem[:].reshape(B, 1, 1, 1)  # (B, 1, 1, 1) int32
    for i in range(n_caches):
        if kinds[i] == "rows":
            off = pos_v % 8
            row = jax.lax.broadcasted_iota(
                jnp.int32, scratches[i].shape, 2)  # (B, H, 8, D)
            sel = row == off
        else:
            sub = (pos_v // 128) % 8
            lane = pos_v % 128
            r2 = jax.lax.broadcasted_iota(
                jnp.int32, scratches[i].shape, 2)
            r3 = jax.lax.broadcasted_iota(
                jnp.int32, scratches[i].shape, 3)
            sel = (r2 == sub) & (r3 == lane)
        scratches[i][:] = jnp.where(sel, news[i][:], scratches[i][:])
    for i in range(n_caches):
        for b in range(B):
            pltpu.make_async_copy(
                scr_slice(i, b), tile_slice(outs[i], i, b),
                sem.at[i, b]).start()
    for i in range(n_caches):
        for b in range(B):
            pltpu.make_async_copy(
                scr_slice(i, b), tile_slice(outs[i], i, b),
                sem.at[i, b]).wait()


@functools.partial(jax.jit, static_argnames=("kinds", "interpret"))
def _kv_write(lengths, news, caches, kinds, interpret=False):
    B = lengths.shape[0]
    n = len(caches)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]  # lengths (B, 1) vmem
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in news]
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in caches]
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in caches],
        scratch_shapes=(
            [pltpu.VMEM(
                (B, c.shape[1], 8, c.shape[3]), c.dtype)
             for c in caches]
            + [pltpu.SemaphoreType.DMA((n, B))]
        ),
    )
    out = pl.pallas_call(
        functools.partial(_write_kernel, kinds, B),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches],
        # input index space includes the scalar-prefetch arg: lengths=0,
        # lens_vmem=1, news=2..n+1, caches=n+2..2n+1 → alias cache i
        input_output_aliases={2 + n + i: i for i in range(n)},
        interpret=interpret,
    )(lengths.astype(jnp.int32), lengths.astype(jnp.int32)[:, None],
      *news, *caches)
    return tuple(out)


def kv_cache_write(caches: Sequence[jax.Array], news: Sequence[jax.Array],
                   lengths: jax.Array, interpret=None):
    """Write one new token per slot into each cache, in place.

    caches: each either (B, H, S, D) with a (B, H, D) new ("rows" kind —
            k/v values), or (B, H, S/128, 128) with a (B, H) new ("flat"
            kind — per-token scale planes, see scale_plane_* below).
            Buffers are donated/aliased; returns the updated ones.
    lengths: (B,) int32 — position to write for each slot
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kinds = []
    news4 = []
    for c, x in zip(caches, news):
        if x.ndim == 3:  # (B, H, D) value row
            kinds.append("rows")
            news4.append(x[:, :, None, :])
        else:  # (B, H) scalar per (slot, head)
            kinds.append("flat")
            news4.append(x[:, :, None, None])
            assert c.shape[2] % 8 == 0, (
                f"scale plane sublane dim {c.shape[2]} must be a multiple "
                "of 8 (allocate with scale_plane_init)")
    # split into multiple pallas calls when the VMEM footprint would exceed
    # the ~16 MB scoped limit (e.g. int8 codes + f32 scale planes for both
    # k and v in one call). Each cache costs one (B, H, 8, D) scratch tile
    # PLUS its news block, which Mosaic pads up to the same tile shape.
    budget = 10 * 1024 * 1024
    groups, cur, cur_bytes = [], [], 0
    for i, c in enumerate(caches):
        sz = 2 * c.shape[0] * c.shape[1] * 8 * c.shape[3] * c.dtype.itemsize
        if cur and cur_bytes + sz > budget:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += sz
    groups.append(cur)
    out = [None] * len(caches)
    for g in groups:
        res = _kv_write(
            lengths, tuple(news4[i] for i in g), tuple(caches[i] for i in g),
            tuple(kinds[i] for i in g), interpret=interpret)
        for i, r in zip(g, res):
            out[i] = r
    return tuple(out)


def scale_plane_init(B: int, H: int, S: int, dtype=jnp.float32) -> jax.Array:
    """Allocate a per-token scale cache in the DMA-friendly plane layout
    (B, H, s8, 128): position p lives at (p // 128, p % 128). The sublane
    dim s8 = ceil(S/128) rounded UP TO A MULTIPLE OF 8 so the kernel's
    8-sublane RMW tile at sa=(p//128//8)*8 is always in bounds — a non-
    multiple (e.g. S=1536 -> 12 sublanes) would make Mosaic clamp the
    dynamic-slice base for p >= 1024 and silently write scales to the
    wrong plane rows."""
    lanes_rows = -(-S // 128)          # rows of 128 lanes
    s8 = -(-lanes_rows // 8) * 8       # rounded up to 8 sublanes
    return jnp.zeros((B, H, max(8, s8), 128), dtype)


def scale_plane_view(plane: jax.Array, kv_len: int = None) -> jax.Array:
    """(B, H, s8, 128) plane -> (B, H, kv_len) scales (row-major reshape
    is layout-free)."""
    B, H, s8, _ = plane.shape
    flat = plane.reshape(B, H, s8 * 128)
    return flat if kv_len is None else flat[:, :, :kv_len]


def _prefill_kernel(slot_ref, new_ref, cache_ref, out_ref, sem):
    i = pl.program_id(0)
    slot = slot_ref[i]
    s_p = new_ref.shape[2]
    dma = pltpu.make_async_copy(
        new_ref, out_ref.at[pl.ds(slot, 1), :, pl.ds(0, s_p), :], sem)
    dma.start()
    dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kv_prefill(slots, new, cache, interpret=False):
    N = slots.shape[0]
    _, H, S_p, D = new.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, S_p, D), lambda i, _=None: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        _prefill_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(slots.astype(jnp.int32), new, cache)


def kv_cache_prefill_write(cache: jax.Array, new: jax.Array,
                           slots: jax.Array, interpret=None) -> jax.Array:
    """Write N prefilled sequences into their cache slots, in place.

    cache: (B, H, S, D) — aliased
    new:   (N, H, S_p, D), S_p <= S; lands at cache[slot, :, :S_p, :]
    slots: (N,) int32 target slots
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _kv_prefill(slots, new, cache, interpret=interpret)


# ---------------------------------------------------------------------------
# span writes: `span` CONTIGUOUS rows per slot in one RMW
#
# The per-step write kernel above issues 2 DMAs per (slot, cache) for ONE
# row — measured IN SITU (scripts/exp_engine_attrib.py) those latency-bound
# little DMAs cost 5.1 ms of a 22.4 ms int8-KV decode step (batch 32, 32
# layers x 4 buffers x 32 slots). The serving engines therefore STAGE
# decode tokens in a ring buffer (serving/engine.py::_decode_multi_impl)
# and flush n_steps contiguous rows at once through this kernel: the same
# 2 DMAs per (slot, cache) now carry `span` rows (the RMW tile grows from
# 8 to ceil((7+span)/8)*8 sublanes), an 8x amortization at step_n(8). The
# speculative-decoding verify pass writes its s contiguous positions the
# same way (one call instead of s chained ones).


def _span_kernel(B: int, span: int, T: int, n: int, len_ref, *refs):
    """refs = (lens_vmem, news..., caches..., outs..., scratches..., sem).

    Per slot: RMW the T-sublane tile range [pa, pa+T) of cache dim 2 where
    pa = min((pos//8)*8, S-T) — T is sized so pos%8 + span <= T, and the
    clamp keeps the tile in bounds near the buffer end (the span itself is
    bounds-checked by the engine's capacity guard)."""
    lens_vmem = refs[0]
    news = refs[1 : 1 + n]
    caches = refs[1 + n : 1 + 2 * n]
    outs = refs[1 + 2 * n : 1 + 3 * n]
    scratches = refs[1 + 3 * n : 1 + 4 * n]
    sem = refs[-1]
    S = caches[0].shape[2]

    def base(b):
        # clamp BEFORE the tile floor: Mosaic must prove the slice base is
        # 8-divisible, which (min(pos, S-T) // 8) * 8 is syntactically
        # (min of two divisibles is not, to its prover); S-T is 8-divisible
        # so the two forms agree
        return (jnp.minimum(len_ref[b], S - T) // 8) * 8

    def tile(ref, i, b):
        return ref.at[pl.ds(b, 1), :, pl.ds(base(b), T), :]

    for i in range(n):
        for b in range(B):
            pltpu.make_async_copy(
                tile(caches[i], i, b), scratches[i].at[pl.ds(b, 1)],
                sem.at[i, b]).start()
    for i in range(n):
        for b in range(B):
            pltpu.make_async_copy(
                tile(caches[i], i, b), scratches[i].at[pl.ds(b, 1)],
                sem.at[i, b]).wait()
    pos_v = lens_vmem[:].reshape(B, 1, 1, 1)
    pa_v = (jnp.minimum(pos_v, S - T) // 8) * 8
    off = pos_v - pa_v  # (B, 1, 1, 1), in [0, 8) away from the clamp
    for i in range(n):
        row = jax.lax.broadcasted_iota(jnp.int32, scratches[i].shape, 2)
        acc = scratches[i][:]
        for j in range(span):
            sel = row == off + j
            acc = jnp.where(
                sel,
                jnp.broadcast_to(news[i][:, :, j : j + 1, :], acc.shape),
                acc)
        scratches[i][:] = acc
    for i in range(n):
        for b in range(B):
            pltpu.make_async_copy(
                scratches[i].at[pl.ds(b, 1)], tile(outs[i], i, b),
                sem.at[i, b]).start()
    for i in range(n):
        for b in range(B):
            pltpu.make_async_copy(
                scratches[i].at[pl.ds(b, 1)], tile(outs[i], i, b),
                sem.at[i, b]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kv_write_span(lengths, news, caches, interpret=False):
    B = lengths.shape[0]
    n = len(caches)
    span = news[0].shape[2]
    T = -(-(7 + span) // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in news]
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in caches]
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in caches],
        scratch_shapes=(
            [pltpu.VMEM((B, c.shape[1], T, c.shape[3]), c.dtype)
             for c in caches]
            + [pltpu.SemaphoreType.DMA((n, B))]
        ),
    )
    out = pl.pallas_call(
        functools.partial(_span_kernel, B, span, T, n),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches],
        input_output_aliases={2 + n + i: i for i in range(n)},
        # the compiler's accounting of the scratch + staged news blocks
        # lands ~2.8x the raw sizes (measured: one bf16 (32,32,512,128)
        # cache call = 16.4 MB against the default 16 MB scoped limit);
        # the kernel is DMA-latency-bound, so trading VMEM headroom for
        # fewer calls is the right side of the bargain on a 128 MB part
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths.astype(jnp.int32), lengths.astype(jnp.int32)[:, None],
      *news, *caches)
    return tuple(out)


def kv_cache_write_span(caches: Sequence[jax.Array],
                        news: Sequence[jax.Array],
                        lengths: jax.Array, interpret=None):
    """Write `span` contiguous rows per slot into each (B, H, S, D) cache.

    news: each (B, H, span, D) — rows land at positions
          lengths[b] .. lengths[b]+span-1 of slot b (caller guarantees
          lengths[b]+span <= S for live slots). Buffers aliased in place.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    span = news[0].shape[2]
    T = -(-(7 + span) // 8) * 8
    S = caches[0].shape[2]
    if S < T:
        # buffer too short for the RMW tile (tiny test configs): fall back
        # to chained single-row writes
        bufs = tuple(caches)
        for j in range(span):
            bufs = kv_cache_write(
                bufs, tuple(x[:, :, j] for x in news), lengths + j,
                interpret=interpret)
        return bufs
    # VMEM budget grouping as in kv_cache_write: per cache one (B, H, T, D)
    # scratch + the (B, H, span, D) news block, each of which the compiler
    # may double-buffer — counted with a 2x allowance against the raised
    # per-call vmem limit below (k+v pairs should share a call so their
    # DMAs overlap)
    budget = 40 * 1024 * 1024
    groups, cur, cur_bytes = [], [], 0
    for i, c in enumerate(caches):
        sz = (2 * (T + span)
              * c.shape[0] * c.shape[1] * c.shape[3] * c.dtype.itemsize)
        if cur and cur_bytes + sz > budget:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(i)
        cur_bytes += sz
    groups.append(cur)
    out = [None] * len(caches)
    for g in groups:
        res = _kv_write_span(
            lengths, tuple(news[i] for i in g), tuple(caches[i] for i in g),
            interpret=interpret)
        for i, r in zip(g, res):
            out[i] = r
    return tuple(out)


def scale_plane_write_span(plane: jax.Array, vals: jax.Array,
                           lengths: jax.Array) -> jax.Array:
    """Write (B, H, span) per-token scales at positions
    lengths[b]..lengths[b]+span-1 of each slot's flat scale plane.

    Implemented as a DENSE one-hot contraction + select, not a scatter:
    a vmapped dynamic_update_slice was measured at ~117 us per plane on
    v5e (batch 32 — XLA serializes the per-slot starts), while this form
    is one tiny (B, S, span) x (B, H, span) einsum plus an elementwise
    select over the ~2 MB plane — pure MXU/VPU work that fuses."""
    B, H, s8, _ = plane.shape
    S = s8 * 128
    flat = plane.reshape(B, H, S)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]          # (1, S)
    base = lengths.astype(jnp.int32)[:, None]              # (B, 1)
    span = vals.shape[2]
    onehot = (pos[:, :, None]
              == base[:, :, None] + jnp.arange(span)[None, None, :])
    placed = jnp.einsum(
        "bsj,bhj->bhs", onehot.astype(flat.dtype),
        vals.astype(flat.dtype))
    in_win = (pos >= base) & (pos < base + span)            # (B, S)
    flat = jnp.where(in_win[:, None, :], placed, flat)
    return flat.reshape(B, H, s8, 128)
