"""Native checkpoint save/load for model parameter trees.

Parity note: the reference keeps models as read-only GGUF/ONNX artifacts
(SURVEY.md section 5.4). Here the native artifact is an orbax checkpoint
of the parameter pytree (quantized leaves included) plus a JSON sidecar
carrying the architecture config — convert a GGUF once
(models/convert.py), save natively, reload in seconds.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from trackiellm_tpu.models import llm as llm_model
from trackiellm_tpu.ops.quant import QuantizedLinear
from trackiellm_tpu.utils.errors import ErrorCode, TrackieError
from trackiellm_tpu.utils.paths import Path

_CONFIG_FILE = "config.json"
_TREE_FILE = "tree.json"
_ARRAYS_FILE = "arrays.npz"

# Q4 packed-nibble encoding version. "mixed-bias-v2" = low nibble biased
# +8, high nibble two's complement (ops/quant.py quantize_q4). Checkpoints
# written before this marker existed used "biased-v1" (BOTH nibbles biased
# +8) and would silently mis-decode under the current kernels — the loader
# detects and repacks them instead.
_Q4_PACKING = "mixed-bias-v2"


def _repack_q4_biased_v1(packed: np.ndarray) -> np.ndarray:
    """Convert legacy biased-v1 packed Q4 (both nibbles q+8) to the
    current mixed-bias-v2 layout (high nibble two's complement)."""
    lo = packed & 0x0F                        # stays biased
    hi = ((packed >> 4) & 0x0F).astype(np.int16) - 8   # unbias
    hi = (hi & 0x0F).astype(np.uint8)         # re-encode two's complement
    return (lo | (hi << 4)).astype(np.uint8)


def _flatten(params: Any) -> Tuple[Dict[str, np.ndarray], Any]:
    """Flatten a pytree into named arrays + a structure descriptor.

    npz-based rather than orbax's OCDBT: single-file artifacts, no
    async-manager teardown issues, loadable with plain numpy. Quantized
    leaves round-trip via a ``__qlin__`` marker in the structure.
    """
    leaves: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, QuantizedLinear):
            leaves[f"{prefix}.values"] = np.asarray(node.values)
            leaves[f"{prefix}.scales"] = np.asarray(node.scales)
            return {"__qlin__": prefix}
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{prefix}[{i}]") for i, v in enumerate(node)]
        leaves[prefix] = np.asarray(node)
        return {"__leaf__": prefix, "__dtype__": str(np.asarray(node).dtype)}

    tree = walk(params, "")
    return leaves, tree


def _unflatten(tree: Any, arrays: Dict[str, np.ndarray],
               device_put: bool) -> Any:
    import jax.numpy as jnp

    def lift(a):
        return jnp.asarray(a) if device_put else a

    def walk(node):
        if isinstance(node, dict):
            if "__qlin__" in node:
                p = node["__qlin__"]
                return QuantizedLinear(values=lift(arrays[f"{p}.values"]),
                                       scales=lift(arrays[f"{p}.scales"]))
            if "__leaf__" in node:
                # dtype restoration (incl. bf16 views) happens in
                # load_checkpoint before unflattening.
                return lift(arrays[node["__leaf__"]])
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        raise TrackieError(ErrorCode.MODEL_METADATA_INVALID,
                           f"bad tree node {node!r}")

    return walk(tree)


def save_checkpoint(directory: str, params: Any,
                    config: Optional[Any] = None,
                    metadata: Optional[Dict] = None) -> None:
    """Save params (+ config NamedTuple + metadata) to a directory."""
    os.makedirs(directory, exist_ok=True)
    leaves, tree = _flatten(params)
    # bfloat16 isn't npz-native: store raw uint16 view with dtype marker.
    packed = {}
    dtypes = {}
    for name, arr in leaves.items():
        dtypes[name] = str(arr.dtype)
        if arr.dtype == jax.numpy.bfloat16:
            packed[name] = np.asarray(arr).view(np.uint16)
        else:
            packed[name] = arr
    np.savez(os.path.join(directory, _ARRAYS_FILE), **packed)
    Path(os.path.join(directory, _TREE_FILE)).write_text_atomic(
        json.dumps({"tree": tree, "dtypes": dtypes}))
    has_q4 = any(name.endswith(".values") and leaves[name].dtype == np.uint8
                 for name in leaves)
    sidecar = {"metadata": metadata or {},
               "format": {"q4_packing": _Q4_PACKING} if has_q4 else {}}
    if config is not None:
        if hasattr(config, "_asdict"):  # NamedTuple configs
            sidecar["config"] = dict(config._asdict())
        else:  # frozen-dataclass configs (e.g. CLIPVisionConfig)
            import dataclasses as _dc
            sidecar["config"] = _dc.asdict(config)
        sidecar["config_class"] = type(config).__name__
    Path(os.path.join(directory, _CONFIG_FILE)).write_text_atomic(
        json.dumps(sidecar, indent=1))


def load_checkpoint(directory: str, device_put: bool = True,
                    ) -> Tuple[Any, Optional[llm_model.LLMConfig], Dict]:
    """Load (params, config-or-None, metadata)."""
    tree_path = os.path.join(directory, _TREE_FILE)
    if not os.path.exists(tree_path):
        raise TrackieError(ErrorCode.FILE_NOT_FOUND, directory)
    spec = json.loads(Path(tree_path).read_text())
    sidecar = json.loads(Path(os.path.join(directory, _CONFIG_FILE))
                         .read_text())
    q4_packing = sidecar.get("format", {}).get("q4_packing")
    with np.load(os.path.join(directory, _ARRAYS_FILE)) as z:
        arrays = {}
        for name in z.files:
            a = z[name]
            if spec["dtypes"].get(name) == "bfloat16":
                a = a.view(jax.numpy.bfloat16)
            if (name.endswith(".values") and a.dtype == np.uint8
                    and q4_packing != _Q4_PACKING):
                # Legacy (pre-marker) checkpoints used biased-v1 packing;
                # repack rather than silently mis-decode (ADVICE round 2).
                if q4_packing in (None, "biased-v1"):
                    a = _repack_q4_biased_v1(a)
                else:
                    raise TrackieError(
                        ErrorCode.MODEL_METADATA_INVALID,
                        f"unknown q4_packing {q4_packing!r} in {directory}; "
                        f"expected {_Q4_PACKING!r} — re-convert the model")
            arrays[name] = a
    params = _unflatten(spec["tree"], arrays, device_put)
    cfg = None
    if "config" in sidecar and sidecar.get("config_class") == "LLMConfig":
        cfg = llm_model.LLMConfig(**sidecar["config"])
    elif "config" in sidecar and sidecar.get("config_class") == "MLAConfig":
        from trackiellm_tpu.models import mla as mla_model

        cfg = mla_model.MLAConfig(**sidecar["config"])
    elif ("config" in sidecar
          and sidecar.get("config_class") == "CLIPVisionConfig"):
        from trackiellm_tpu.models import clip as clip_model

        cfg = clip_model.CLIPVisionConfig(**sidecar["config"])
    elif ("config" in sidecar
          and sidecar.get("config_class") == "MambaConfig"):
        from trackiellm_tpu.models import mamba as mamba_model

        cfg = mamba_model.MambaConfig(**sidecar["config"])
    elif ("config" in sidecar
          and sidecar.get("config_class") == "Mamba2Config"):
        from trackiellm_tpu.models import mamba2 as mamba2_model

        c = dict(sidecar["config"])
        # JSON round-trips tuples as lists; the config must stay
        # hashable (jit static arg).
        c["dt_limit"] = tuple(c.get("dt_limit", (0.0, float("inf"))))
        cfg = mamba2_model.Mamba2Config(**c)
    elif ("config" in sidecar
          and sidecar.get("config_class") == "TrOCRConfig"):
        from trackiellm_tpu.models import trocr as trocr_model

        cfg = trocr_model.TrOCRConfig(**sidecar["config"])
    elif ("config" in sidecar
          and sidecar.get("config_class") == "Qwen3NextConfig"):
        from trackiellm_tpu.models import qwen3next as q3n_model

        c = dict(sidecar["config"])
        # JSON round-trips tuples as lists; the config must stay
        # hashable (jit static arg).
        c["layer_types"] = tuple(c.get("layer_types", ()))
        cfg = q3n_model.Qwen3NextConfig(**c)
    return params, cfg, sidecar.get("metadata", {})
