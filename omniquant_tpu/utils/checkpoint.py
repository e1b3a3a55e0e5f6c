"""Checkpoint I/O for omni-parameters and packed models.

Role-equivalent of the reference's three checkpoint mechanisms
(SURVEY.md §5 / quantize/omniquant.py:249-250, main.py:348-363,
omniquant.py:255-277), using a simple npz-of-flattened-pytree format that
needs no torch at load time.
"""
from __future__ import annotations

import io
import os
from typing import Any

import jax
import numpy as np


_SEP = "||"
_NONE = "__none__"
_PACKED_FORMAT_VERSION = 2
_LAYOUTS = ("planar", "pairs")  # index order is part of the wire format


def _flatten(tree: Any, prefix: str = "") -> dict:
    from ..quant.packing import PackedWeight

    out = {}
    if tree is None:
        out[prefix + _NONE] = np.asarray(0)
    elif isinstance(tree, PackedWeight):
        out[prefix + "__packed__"] = np.asarray(1)
        # meta format v2: [bits, gs, in, out, tile_k, FORMAT_VERSION,
        # layout_idx] — the layout entry is load-bearing (the pairs 3-bit
        # wire format is incompatible with planar; a checkpoint reloaded
        # under the wrong layout would silently dequantize garbage)
        body = {
            "qweight": tree.qweight, "scales": tree.scales,
            "zeros": tree.zeros, "bias": tree.bias,
            "meta": np.asarray([
                tree.bits, tree.group_size or 0,
                tree.in_features, tree.out_features, tree.tile_k,
                _PACKED_FORMAT_VERSION, _LAYOUTS.index(tree.layout)]),
        }
        out.update(_flatten(body, prefix))
    elif isinstance(tree, dict):
        if not tree:
            out[prefix + "__empty_dict__"] = np.asarray(0)
        for k, v in tree.items():
            out.update(_flatten(v, prefix + str(k) + _SEP))
    elif isinstance(tree, (list, tuple)):
        tag = "__list__" if isinstance(tree, list) else "__tuple__"
        out[prefix + tag] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + str(i) + _SEP))
    else:
        out[prefix + "__leaf__"] = np.asarray(v if (v := tree) is not None else 0)
    return out


def _unflatten(flat: dict) -> Any:
    # direct leaf / none / empty at this level?
    if _NONE in flat:
        return None
    if "__leaf__" in flat:
        return flat["__leaf__"]
    if "__empty_dict__" in flat:
        return {}
    if "__packed__" in flat:
        from ..quant.packing import PackedWeight

        body = _unflatten({k: v for k, v in flat.items() if k != "__packed__"})
        meta = [int(x) for x in body["meta"]]
        bits, gs, in_f, out_f = meta[:4]
        tile = meta[4] if len(meta) > 4 else 0
        if len(meta) < 7:
            raise ValueError(
                "packed checkpoint predates the versioned meta format "
                "(missing layout field) — its wire layout is ambiguous "
                "(planar vs pairs decode incompatibly); re-export it with "
                "the current code (main.py --save_dir)")
        if meta[5] != _PACKED_FORMAT_VERSION:
            raise ValueError(
                f"packed checkpoint format v{meta[5]} != supported "
                f"v{_PACKED_FORMAT_VERSION}; re-export it")
        return PackedWeight(
            qweight=body["qweight"], scales=body["scales"],
            zeros=body["zeros"], bias=body["bias"], bits=bits,
            group_size=gs or None, in_features=in_f, out_features=out_f,
            tile_k=tile, layout=_LAYOUTS[meta[6]])
    if "__list__" in flat or "__tuple__" in flat:
        is_list = "__list__" in flat
        n = int(flat["__list__" if is_list else "__tuple__"])
        children = {}
        for k, v in flat.items():
            if k in ("__list__", "__tuple__"):
                continue
            head, rest = k.split(_SEP, 1)
            children.setdefault(head, {})[rest] = v
        items = [_unflatten(children[str(i)]) for i in range(n)]
        return items if is_list else tuple(items)
    children = {}
    for k, v in flat.items():
        head, rest = k.split(_SEP, 1)
        children.setdefault(head, {})[rest] = v
    return {k: _unflatten(v) for k, v in children.items()}


def save_pytree(path: str, tree: Any) -> None:
    tree = jax.tree.map(
        lambda x: None if x is None else np.asarray(x),
        tree, is_leaf=lambda x: x is None)
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_pytree(path: str) -> Any:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)
