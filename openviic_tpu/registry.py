"""Name -> class registry.

Equivalent of the reference's Detectron2-style registry (reference:
builders/registry.py:8-90): decorator or call registration, duplicate-name
assertion, and lookup by the ``ARCHITECTURE:`` strings that form the public
YAML API surface (SURVEY.md §2.4).  Adds explicit aliases so the two broken
reference configs (``TRAINER: ViTrainer``, ``ARCHITECTURE:
StandardStranformerUsingRegion`` — typos shipped in rstnet.yaml /
dlct-transformer.yaml) still resolve."""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}
        self._aliases: Dict[str, str] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise KeyError(
                f"An object named {name!r} was already registered in "
                f"{self._name!r} registry!"
            )
        self._obj_map[name] = obj

    def register(self, obj: Any = None, *, name: Optional[str] = None) -> Any:
        """Register a class, usable as ``@REG.register()`` or ``REG.register(cls)``."""
        if obj is None:

            def deco(cls: Any) -> Any:
                self._do_register(name or cls.__name__, cls)
                return cls

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def alias(self, alias_name: str, target: str) -> None:
        self._aliases[alias_name] = target

    def get(self, name: str) -> Any:
        resolved = self._aliases.get(name, name)
        ret = self._obj_map.get(resolved)
        if ret is None:
            raise KeyError(
                f"No object named {name!r} found in {self._name!r} registry! "
                f"Registered: {sorted(self._obj_map.keys())}"
            )
        return ret

    def __contains__(self, name: str) -> bool:
        return self._aliases.get(name, name) in self._obj_map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()

    def __repr__(self) -> str:
        lines = [f"Registry of {self._name}:"]
        for key in sorted(self._obj_map):
            lines.append(f"  {key}: {self._obj_map[key]!r}")
        return "\n".join(lines)
