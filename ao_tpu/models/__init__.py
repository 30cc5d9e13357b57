"""Model registry: resolve a config instance to its functional model module.

Generic infrastructure (the serving engine, the one-shot decode loop, eval)
needs `forward(params, tokens, cfg, positions=, kv_caches=, cache_index=)`
and `init_kv_caches(cfg, batch, max_seq)`. Every model family in this
package exposes that interface; the registry maps config types to modules
so the infrastructure is model-agnostic (ref analog: the reference's
vLLM/gpt-fast integration contract, which keys on model class).

Register out-of-tree families with `register_model(MyConfig, my_module)`.
"""

from typing import Any, Dict, Type

_REGISTRY: Dict[Type, Any] = {}


def register_model(config_cls: type, module: Any) -> None:
    """Map a model-config dataclass to its functional module (must expose
    ``forward`` and ``init_kv_caches``)."""
    _REGISTRY[config_cls] = module


def resolve_model(cfg: Any):
    """The model module serving ``cfg``. Built-ins register lazily."""
    if not _REGISTRY:
        from ao_tpu.models import gemma, llama

        register_model(llama.LlamaConfig, llama)
        register_model(gemma.GemmaConfig, gemma)
    for cls, mod in _REGISTRY.items():
        if isinstance(cfg, cls):
            return mod
    raise TypeError(
        f"no model registered for config {type(cfg).__name__}; call "
        "ao_tpu.models.register_model(type(cfg), module)"
    )
