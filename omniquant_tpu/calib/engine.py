"""Block-wise OmniQuant calibration — the TPU-native `omniquant()` equivalent.

Re-design of the reference's hot loop (quantize/omniquant.py:22-289) around
JAX's compilation model:

  * No Catcher exception hack: the functional embed() gives layer-0 inputs
    directly (reference :89-113 needed a raising nn.Module because the torch
    model is a black box).
  * One jitted train step / fp step / propagate step compiled once and reused
    for every layer (shape-stable across a family's blocks), with buffer
    donation for the (nsamples, seqlen, hidden) activation tensors.
  * Trainables are a pytree {'let': ..., 'lwc': ...}; optax.multi_transform
    gives the two learning-rate groups (reference :204-208 AdamW param
    groups, let_lr 5e-3 / lwc_lr 1e-2, wd 0).
  * f32 parameters and compute by default (the reference's own
    --deactive_amp regime, main.py:241-242 — bf16 buffers optional for
    large models); no loss scaler needed.
  * After each block: stop_gradient fold (LET into norms/linears, weights
    hard fake-quantized) == smooth_and_quant_inplace (:239), then the
    quantized block propagates quant_inps (:241-245), and the trainables are
    checkpointed per layer (:249-250).
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.common import ActQuantSpec, causal_mask
from ..models.registry import ModelFamily
from ..quant.quantizer import QuantConfig
from ..utils.checkpoint import load_pytree, save_pytree


@dataclasses.dataclass
class CalibConfig:
    """Hyperparameters (reference main.py:193-229 argparse defaults where
    they exist; epochs default 20 per the blessed scripts)."""

    wbits: int = 4
    abits: int = 16
    group_size: Optional[int] = None
    symmetric: bool = False
    lwc: bool = True
    let: bool = False
    alpha: float = 0.5
    epochs: int = 20
    nsamples: int = 128
    batch_size: int = 1
    let_lr: float = 5e-3
    lwc_lr: float = 1e-2
    wd: float = 0.0
    aug_loss: bool = False
    buffer_dtype: Any = jnp.float32  # bf16 for 13B+ to halve activation memory
    offload_layers: bool = False  # host-stream layers: one block on device at
    # a time (the reference's CPU<->GPU layer streaming, omniquant.py:115-132,
    # 248 — how falcon-180b calibrates on a single accelerator)
    output_dir: Optional[str] = None
    resume: Optional[str] = None

    @property
    def weight_quant_config(self) -> Optional[QuantConfig]:
        if self.wbits >= 16:
            return None
        return QuantConfig(
            n_bits=self.wbits,
            symmetric=self.symmetric,
            group_size=self.group_size,
            lwc=self.lwc,
        )

    @property
    def act_quant_spec(self) -> ActQuantSpec:
        return ActQuantSpec.from_bits(self.abits)


def _tree_none_if_empty(d):
    return d if d else None


def calibrate(
    family: ModelFamily,
    params: dict,
    model_cfg,
    calib_tokens: jax.Array,  # (nsamples, seqlen) int32
    cc: CalibConfig,
    act_scales: Optional[list] = None,  # per-layer {linear_name: (in,)} stats
    act_shifts: Optional[list] = None,
    logger=None,
    progress_cb: Optional[Callable] = None,
    sp_mesh=None,  # jax Mesh with axis `sp_axis`: sequence-parallel mode
    sp_axis: str = "sp",
    sp_attn_impl: Optional[str] = None,  # capture-pass ring impl; None=auto
) -> tuple:
    """Run block-wise calibration in place over `params['layers']`.

    Returns (params, omni_parameters) where omni_parameters is
    {layer_idx: {'let': ..., 'lwc': ...}} — the distribution format
    (reference omni_parameters.pth, quantize/omniquant.py:249-250).
    """
    log = logger.info if logger else (lambda *a: None)
    n, seqlen = calib_tokens.shape
    assert n == cc.nsamples, (n, cc.nsamples)
    wcfg = cc.weight_quant_config
    spec = cc.act_quant_spec
    bs = cc.batch_size

    # ---- layer-0 inputs (replaces the Catcher; reference :83-113) ----
    embed_fn = jax.jit(lambda p, t: family.embed(p, t, model_cfg).astype(cc.buffer_dtype))
    emb_params = {k: v for k, v in params.items() if k != "layers"}
    # chunk to bound embed memory for big vocab
    quant_inps = jnp.concatenate(
        [embed_fn(emb_params, calib_tokens[i : i + 8]) for i in range(0, n, 8)]
    )
    # real copies: the per-block functions donate these buffers, so they must
    # not alias each other (reference deepcopies at :136-138 for the same
    # reason, minus the donation)
    fp_inps = jnp.copy(quant_inps)
    fp_inps_2 = jnp.copy(quant_inps) if cc.aug_loss else None

    mask = causal_mask(seqlen, seqlen, dtype=cc.buffer_dtype)
    positions = jnp.arange(seqlen)

    # ---- jitted per-block functions, compiled once, reused per layer ----
    @partial(jax.jit, donate_argnums=(1,))
    def fp_block_all(layer, xs):
        """Full-precision reference outputs for all samples (:165-172)."""
        def body(carry, x):
            y, _ = family.block_forward(layer, x[None], model_cfg, mask, positions)
            return carry, y[0]
        _, ys = jax.lax.scan(body, None, xs)
        return ys

    @partial(jax.jit, donate_argnums=(1,))
    def quant_block_all(layer, xs):
        """Propagate quantized-activation inputs (:241-245): quantized
        weights (already folded into `layer`) + act quant enabled."""
        def body(carry, x):
            y, _ = family.block_forward(
                layer, x[None], model_cfg, mask, positions, spec)
            return carry, y[0]
        _, ys = jax.lax.scan(body, None, xs)
        return ys

    def loss_fn(trainable, layer, qin, fp_out, fp_out_2):
        eff = family.effective_block_weights(
            layer, wcfg,
            _tree_none_if_empty(trainable.get("lwc")),
            _tree_none_if_empty(trainable.get("let")),
            model_cfg,
        )
        out, _ = family.block_forward(eff, qin, model_cfg, mask, positions, spec)
        loss = jnp.mean((out.astype(jnp.float32) - fp_out.astype(jnp.float32)) ** 2)
        if fp_out_2 is not None:
            loss = loss + jnp.mean(
                (out.astype(jnp.float32) - fp_out_2.astype(jnp.float32)) ** 2)
        return loss

    def make_optimizer():
        def label_fn(tree):
            return {k: jax.tree.map(lambda _: k, v) for k, v in tree.items()}
        return optax.multi_transform(
            {
                "let": optax.adamw(cc.let_lr, weight_decay=cc.wd),
                "lwc": optax.adamw(cc.lwc_lr, weight_decay=cc.wd),
            },
            label_fn,
        )

    opt = make_optimizer()

    def _truncate_stored_let(trainable):
        """Truncate the STORED smooth-scale params, as the reference does
        in-place at the top of every smooth_and_quant_temporary call
        (`module.data = truncate_number(module)`, int_llama_layer.py:283-285).
        Without this the optimizer trajectory diverges from the reference
        whenever a scale dips below the 1e-2 threshold: the reference's next
        step starts from the truncated value, ours would start from the raw
        one. Applied outside the grad; effective_block_weights' own
        truncate_number is then an identity on these values (idempotent)."""
        if "let" not in trainable:
            return trainable
        from ..quant.transform import _truncate_fwd_value

        trainable = dict(trainable)
        trainable["let"] = {
            k: (_truncate_fwd_value(v, 1e-2) if "smooth_scale" in k else v)
            for k, v in trainable["let"].items()
        }
        return trainable

    @jax.jit
    def train_step(trainable, opt_state, layer, qin, fp_out, fp_out_2):
        trainable = _truncate_stored_let(trainable)
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, layer, qin, fp_out, fp_out_2)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss, gnorm

    # ---- sequence-parallel (context-parallel) mode -----------------------
    # seqlen > 2048 calibration: shard the SEQUENCE axis of every activation
    # buffer over sp_mesh and run each per-block forward under shard_map
    # with ring attention (parallel/ring_attention.py — k/v blocks rotate
    # via ppermute, flash kernel per block). No chip ever holds more than
    # S/n of a sample. Training steps use the differentiable jnp ring path
    # (the flash kernel has no VJP); the fp-capture and quant-propagation
    # passes use flash-in-ring. Net-new vs the reference (seqlen pinned to
    # 2048 at main.py:261; SURVEY.md §5 "long-context: absent").
    if sp_mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.common import maybe_quant
        from ..parallel.ring_attention import ring_attention_local

        # llama + OPT: both families' block_forward expose the attn_impl
        # ring hook. OPT pre-scales q by hd**-0.5 and quantizes q/k/v at
        # its reference sites BEFORE the hook (int_opt_layer.py:96-118),
        # so the ring runs at sm_scale=1.0 with identity hook-quantizers.
        # Falcon stays out: its reference calibration is LWC-only at
        # seqlen 2048 (models/falcon.py:243-256) and ALiBi needs a
        # global-position bias inside the ring.
        assert family.name in ("llama", "opt"), (
            "sequence-parallel calibration supports llama and opt "
            f"(got {family.name})")
        sp_sm_scale = 1.0 if family.name == "opt" else None
        n_sp = sp_mesh.shape[sp_axis]
        assert seqlen % n_sp == 0, (seqlen, n_sp)
        s_local = seqlen // n_sp
        assert spec.p is None or not spec.p.enabled, (
            "softmax-probs quantizers are not supported under sp")
        if sp_attn_impl is None:
            # flash-in-ring on real hardware; the jnp ring on CPU (the flash
            # kernel's interpret mode is far too slow for capture passes)
            sp_attn_impl = ("flash" if jax.default_backend() == "tpu"
                            else "jnp")
        xs_spec = P(None, sp_axis, None)

        def _repl(tree):
            return jax.tree.map(
                lambda a: P(), tree, is_leaf=lambda a: a is None)

        def _ring_attn(impl):
            def attn(q, k, v, spec_):
                # the eval path's q/k/v per-token quant (over head_dim for
                # llama; OPT quantized pre-hook, spec_ carries identities)
                # is row-local, so shard-local quantization is exact
                q = maybe_quant(q, spec_.q)
                k = maybe_quant(k, spec_.k)
                v = maybe_quant(v, spec_.v)
                return ring_attention_local(
                    q, k, v, axis=sp_axis, n=n_sp, sm_scale=sp_sm_scale,
                    causal=True, impl=impl)
            return attn

        def _local_pos():
            return (jax.lax.axis_index(sp_axis) * s_local
                    + jnp.arange(s_local))

        def _sp_block_all(spec_arg, impl):
            def inner(layer, xs):
                pos = _local_pos()
                def body(carry, x):
                    y, _ = family.block_forward(
                        layer, x[None], model_cfg, None, pos, spec_arg,
                        attn_impl=_ring_attn(impl))
                    return carry, y[0]
                _, ys = jax.lax.scan(body, None, xs)
                return ys

            @partial(jax.jit, donate_argnums=(1,))
            def fn(layer, xs):
                return shard_map(
                    inner, mesh=sp_mesh, in_specs=(_repl(layer), xs_spec),
                    out_specs=xs_spec, check_vma=False)(layer, xs)

            return fn

        from ..models.common import NO_ACT_QUANT

        fp_block_all = _sp_block_all(NO_ACT_QUANT, sp_attn_impl)
        quant_block_all = _sp_block_all(spec, sp_attn_impl)

        def _sp_loss_inner(trainable, layer, qin_l, fp_l, fp2_l):
            eff = family.effective_block_weights(
                layer, wcfg,
                _tree_none_if_empty(trainable.get("lwc")),
                _tree_none_if_empty(trainable.get("let")),
                model_cfg,
            )
            out, _ = family.block_forward(
                eff, qin_l, model_cfg, None, _local_pos(), spec,
                attn_impl=_ring_attn("jnp"))
            loss = jax.lax.pmean(jnp.mean(
                (out.astype(jnp.float32) - fp_l.astype(jnp.float32)) ** 2
            ), sp_axis)
            if fp2_l is not None:
                loss = loss + jax.lax.pmean(jnp.mean(
                    (out.astype(jnp.float32) - fp2_l.astype(jnp.float32))
                    ** 2), sp_axis)
            return loss

        def _sp_loss_fn(trainable, layer, qin, fp_out, fp_out_2):
            if fp_out_2 is None:
                def inner2(t, l, q, f):
                    return _sp_loss_inner(t, l, q, f, None)
                return shard_map(
                    inner2, mesh=sp_mesh,
                    in_specs=(_repl(trainable), _repl(layer), xs_spec,
                              xs_spec),
                    out_specs=P(), check_vma=False)(
                        trainable, layer, qin, fp_out)
            return shard_map(
                _sp_loss_inner, mesh=sp_mesh,
                in_specs=(_repl(trainable), _repl(layer), xs_spec, xs_spec,
                          xs_spec),
                out_specs=P(), check_vma=False)(
                    trainable, layer, qin, fp_out, fp_out_2)

        @jax.jit
        def train_step(trainable, opt_state, layer, qin, fp_out, fp_out_2):
            trainable = _truncate_stored_let(trainable)
            loss, grads = jax.value_and_grad(_sp_loss_fn)(
                trainable, layer, qin, fp_out, fp_out_2)
            gnorm = optax.global_norm(grads)
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, gnorm

        sh = NamedSharding(sp_mesh, xs_spec)
        quant_inps = jax.device_put(quant_inps, sh)
        fp_inps = jax.device_put(fp_inps, sh)
        if fp_inps_2 is not None:
            fp_inps_2 = jax.device_put(fp_inps_2, sh)

    from ..quant.quantizer import fake_quant_weight, weight_scale_zp

    @jax.jit
    def fold_block(layer, trainable):
        """smooth_and_quant_inplace (:239): fold LET, hard fake-quant weights.

        Also returns per-linear (scale, round_zero_point) — the
        register_scales_and_zeros equivalent (reference :246,
        quantize/quantizer.py:149-152) consumed by real-quant packing.
        """
        lwc = _tree_none_if_empty(trainable.get("lwc"))
        let = _tree_none_if_empty(trainable.get("let"))
        smoothed = family.effective_block_weights(
            layer, None, None, let, model_cfg, quantize=False)
        qparams = {}
        if wcfg is not None:
            for name in family.linear_names:
                w = smoothed[name]["weight"]
                lw = lwc.get(name) if lwc else None
                scale, rzp = weight_scale_zp(w, wcfg, lw)
                qparams[name] = {"scale": scale, "zero": rzp}
                smoothed[name] = dict(smoothed[name])
                smoothed[name]["weight"] = fake_quant_weight(w, wcfg, lw)
        return jax.lax.stop_gradient((smoothed, qparams))

    if cc.let and not family.supports_let:
        log(f"WARNING: {family.name} does not support LET "
            "(reference is LWC-only for this family); proceeding without it")

    omni_parameters = {}
    if cc.resume:
        loaded = load_pytree(cc.resume)
        omni_parameters = {int(k): v for k, v in loaded.items()}
        log(f"resumed omni parameters for {len(omni_parameters)} layers")

    import numpy as _np

    layers = params["layers"]
    if cc.offload_layers:
        # park every layer in host memory; stream one at a time below
        layers = [
            jax.tree.map(
                lambda x: None if x is None else _np.asarray(x), b,
                is_leaf=lambda x: x is None)
            for b in layers
        ]

    for i in range(len(layers)):
        t0 = time.time()
        log(f"=== Start quantize layer {i} ===")
        layer = layers[i]
        if cc.offload_layers:
            layer = jax.tree.map(
                lambda x: None if x is None else jnp.asarray(x), layer,
                is_leaf=lambda x: x is None)

        if cc.epochs > 0:
            fp_inps = fp_block_all(layer, fp_inps)  # in-place via donation (:170)
            if cc.aug_loss:
                # second target: the FP block applied to the *quantized*
                # trajectory (reference :172) — copy since the fn donates
                fp_inps_2 = fp_block_all(layer, jnp.copy(quant_inps))

        # ---- init trainables (reference :175-197) ----
        trainable = {}
        if cc.let and family.supports_let:
            scales_i = act_scales[i] if act_scales is not None else None
            shifts_i = act_shifts[i] if act_shifts is not None else None
            if family.name == "llama":
                let = family.init_let_params(
                    layer, model_cfg, scales_i, alpha=cc.alpha)
            else:
                let = family.init_let_params(
                    layer, model_cfg, scales_i, shifts_i, alpha=cc.alpha)
            trainable["let"] = let
        if cc.lwc and wcfg is not None:
            trainable["lwc"] = family.init_lwc_params_block(layer, wcfg)
        if i in omni_parameters:
            resumed = {k: v for k, v in omni_parameters[i].items()
                       if k in trainable}
            trainable = jax.tree.map(
                lambda _, r: jnp.asarray(r), trainable, resumed)

        if cc.epochs > 0 and trainable:
            opt_state = opt.init(trainable)
            nan_stop = False
            for epoch in range(cc.epochs):
                losses, norms = [], []
                for j in range(cc.nsamples // bs):
                    idx = j * bs
                    trainable, opt_state, loss, gnorm = train_step(
                        trainable, opt_state, layer,
                        quant_inps[idx : idx + bs],
                        fp_inps[idx : idx + bs],
                        fp_inps_2[idx : idx + bs] if cc.aug_loss else None,
                    )
                    losses.append(loss)
                    norms.append(gnorm)
                loss_mean = float(jnp.mean(jnp.stack(losses)))
                norm_mean = float(jnp.mean(jnp.stack(norms)))
                log(f"layer {i} iter {epoch} loss:{loss_mean:.6e} "
                    f"norm:{norm_mean:.6e}")
                if not math.isfinite(loss_mean):
                    log("Loss is NAN, stopping training")  # reference :223-225
                    nan_stop = True
                    break
                if progress_cb:
                    progress_cb(i, epoch, loss_mean)

        # ---- fold + propagate (reference :238-250) ----
        if trainable or wcfg is not None:
            folded, qparams = fold_block(layer, trainable)
        else:
            folded, qparams = layer, {}
        if cc.epochs > 0:
            quant_inps = quant_block_all(folded, quant_inps)
        if cc.offload_layers:
            # propagate first, then park the folded layer back on host
            layers[i] = jax.tree.map(
                lambda x: None if x is None else _np.asarray(x), folded,
                is_leaf=lambda x: x is None)
        else:
            layers[i] = folded
        omni_parameters[i] = dict(trainable)
        if qparams:
            omni_parameters[i]["qparams"] = qparams
        if cc.output_dir:
            save_pytree(
                f"{cc.output_dir}/omni_parameters.npz",
                {str(k): v for k, v in omni_parameters.items()},
            )
        log(f"layer {i} done in {time.time() - t0:.1f}s")

    params["layers"] = layers
    return params, omni_parameters
