"""Light registries used for config-driven dependency injection.

Parity with reference `mcquic/utils/registry.py:7-43` (which delegates to
vlutils.Registry): named lookup tables for models, optimizers, schedulers,
losses, hooks, value tuners and generators.
"""
from typing import Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, T] = {}

    def register(self, obj=None, *, key: str = None):
        def _do(o, k):
            k = k or getattr(o, "__name__", None)
            if k is None:
                raise ValueError(f"Cannot infer registry key for {o!r}")
            self._map[k] = o
            return o
        if obj is None:
            return lambda o: _do(o, key)
        return _do(obj, key)

    def get(self, key: str) -> T:
        if key not in self._map:
            raise KeyError(f"`{key}` not found in {self._name} registry. Available: {sorted(self._map)}")
        return self._map[key]

    def __contains__(self, key: str) -> bool:
        return key in self._map

    def keys(self):
        return self._map.keys()

    def items(self):
        return self._map.items()

    def summary(self) -> str:
        return f"{self._name}: {sorted(self._map)}"


ModuleRegistry: Registry[Callable] = Registry("Module")
ModelRegistry: Registry[Callable] = Registry("Model")
OptimizerRegistry: Registry[Callable] = Registry("Optimizer")
LrSchedulerRegistry: Registry[Callable] = Registry("LrScheduler")
LossRegistry: Registry[Callable] = Registry("Loss")
HookRegistry: Registry[Callable] = Registry("Hook")
ValueTunerRegistry: Registry[Callable] = Registry("ValueTuner")
GeneratorRegistry: Registry[Callable] = Registry("Generator")
