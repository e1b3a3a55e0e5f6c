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
