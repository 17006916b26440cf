"""Configuration system.

Replaces the reference's yacs CfgNode usage (reference:
parakeet/training/default_config.py:16-22, training/cli.py:36-48,
training/experiment.py:64-71): YAML -> attribute-accessible nested dict,
``--opts KEY VALUE`` dotted overrides, freeze, and reproducibility dump.
"""
from __future__ import annotations

import copy
import io
from typing import List, Optional

import yaml

__all__ = ["Config", "default_training_config", "inference_model_kwargs",
           "resolve_model_kwargs"]


class Config(dict):
    """Nested dict with attribute access and an optional frozen state."""

    def __init__(self, data: Optional[dict] = None, **kwargs):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        merged = dict(data or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, dict) and not isinstance(value, Config):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return [cls._wrap(v) for v in value]
        return value

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    def __setitem__(self, key, value):
        if getattr(self, "_frozen", False):
            raise AttributeError(f"config is frozen; cannot set {key!r}")
        super().__setitem__(key, self._wrap(value))

    # -- lifecycle ----------------------------------------------------------
    def freeze(self) -> "Config":
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    def clone(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, Config) else x
                          for x in v]
            else:
                out[k] = v
        return out

    # -- yaml / overrides ---------------------------------------------------
    @classmethod
    def from_yaml(cls, path) -> "Config":
        with open(path) as f:
            return cls(yaml.safe_load(f) or {})

    def merge_file(self, path) -> "Config":
        self.merge(Config.from_yaml(path))
        return self

    def merge(self, other: dict) -> "Config":
        for k, v in other.items():
            if (k in self and isinstance(self[k], Config)
                    and isinstance(v, dict)):
                self[k].merge(v)
            else:
                self[k] = v
        return self

    def merge_opts(self, opts: List[str]) -> "Config":
        """Apply ``["a.b", "1", "c", "hello", ...]`` dotted overrides."""
        if len(opts) % 2 != 0:
            raise ValueError("opts must be KEY VALUE pairs")
        for key, raw in zip(opts[::2], opts[1::2]):
            value = yaml.safe_load(raw)
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value
        return self

    def dump(self, path=None) -> str:
        text = yaml.safe_dump(self.to_dict(), sort_keys=False)
        if path is not None:
            with io.open(path, "w") as f:
                f.write(text)
        return text


_DTYPE_NAMES = {
    "float32": "float32", "fp32": "float32",
    "bfloat16": "bfloat16", "bf16": "bfloat16",
    "float16": "float16", "fp16": "float16",
}


def resolve_model_kwargs(cfg: dict) -> dict:
    """Model-section kwargs ready for ``Model(**kwargs)``.

    YAML carries the compute dtype as a string (``dtype: bfloat16`` —
    bf16 matmuls hit the MXU at full rate; flax keeps parameters fp32 via
    its separate param_dtype, so this is mixed precision); resolve it to
    the jnp dtype the module fields expect.
    """
    kwargs = dict(cfg)
    if isinstance(kwargs.get("dtype"), str):
        import jax.numpy as jnp
        name = _DTYPE_NAMES.get(kwargs["dtype"].lower())
        if name is None:
            raise ValueError(f"unknown model dtype {kwargs['dtype']!r}; "
                             f"one of {sorted(_DTYPE_NAMES)}")
        kwargs["dtype"] = getattr(jnp, name)
    return kwargs


def inference_model_kwargs(cfg: dict) -> dict:
    """Model-section kwargs with training-only keys stripped.

    ``init_type`` configures the weight-initialization scheme applied at
    train time (reference consumes it before model construction,
    fastspeech2.py:114); it is not a constructor field here, so
    synthesis/export CLIs must drop it before ``Model(**kwargs)``.
    """
    kwargs = resolve_model_kwargs(cfg)
    kwargs.pop("init_type", None)
    return kwargs


def default_training_config() -> Config:
    """Same defaults as the reference (training/default_config.py:16-22)."""
    return Config({
        "valid_interval": 1000,
        "save_interval": 10000,
        "max_iteration": 900000,
    })
