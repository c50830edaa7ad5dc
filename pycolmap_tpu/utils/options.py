"""Options-as-dataclass machinery.

TPU-native re-implementation of the reference's options system
(ref: pycolmap/helpers.h:244-283 ``MakeDataclass``, :53-124 ``UpdateFromDict``):
every algorithm exposes an Options class with defaults, dict/kwargs construction,
recursive dict merge, ``todict``/``mergedict``/``summary``, pickling and copying.

Unlike the reference (pybind11-generated wrappers over C++ structs), these are
plain Python dataclasses, so they are naturally picklable and introspectable.
"""

from __future__ import annotations

import copy as _copy
import dataclasses
import enum
from typing import Any


def _is_options(obj: Any) -> bool:
    return isinstance(obj, BaseOptions)


class BaseOptions:
    """Mixin adding reference-compatible dict semantics to options dataclasses.

    Mirrors pycolmap/helpers.h:244-283: kwargs/dict constructors, recursive
    ``mergedict`` (helpers.h:53-124), ``todict``, ``summary``, string->enum
    implicit conversion (helpers.h:46-51).
    """

    def __init__(self, *args, **kwargs):  # pragma: no cover - replaced by dataclass
        raise NotImplementedError

    @classmethod
    def _field_names(cls):
        return [f.name for f in dataclasses.fields(cls)]

    def mergedict(self, other: dict) -> None:
        """Recursively merge a (possibly nested) plain dict into self."""
        if other is None:
            return
        if not isinstance(other, dict):
            raise TypeError(f"expected dict, got {type(other)}")
        valid = set(self._field_names())
        for key, value in other.items():
            if key not in valid:
                raise AttributeError(
                    f"{type(self).__name__} has no option '{key}'"
                )
            current = getattr(self, key)
            if _is_options(current) and isinstance(value, dict):
                current.mergedict(value)
            elif _is_options(current) and _is_options(value):
                setattr(self, key, _copy.deepcopy(value))
            elif isinstance(current, enum.Enum) and isinstance(value, str):
                setattr(self, key, type(current)[value.upper()])
            elif isinstance(current, enum.Enum) and isinstance(value, int):
                setattr(self, key, type(current)(value))
            else:
                setattr(self, key, value)

    def todict(self, recursive: bool = True) -> dict:
        out = {}
        for name in self._field_names():
            value = getattr(self, name)
            if _is_options(value) and recursive:
                out[name] = value.todict(recursive=True)
            else:
                out[name] = value
        return out

    def summary(self, write_type: bool = False) -> str:
        lines = [f"{type(self).__name__}:"]
        for name in self._field_names():
            value = getattr(self, name)
            if _is_options(value):
                sub = value.summary(write_type).splitlines()
                lines.append(f"  {name}: {sub[0]}")
                lines.extend("  " + s for s in sub[1:])
            else:
                type_str = f" ({type(value).__name__})" if write_type else ""
                lines.append(f"  {name}{type_str} = {value!r}")
        return "\n".join(lines)

    def check(self) -> bool:
        """Validate option invariants; subclasses override. Returns True if OK."""
        return True

    def __copy__(self):
        return dataclasses.replace(self)

    def __deepcopy__(self, memo):
        cls = self.__class__
        result = cls.__new__(cls)
        memo[id(self)] = result
        for name in self._field_names():
            object.__setattr__(
                result, name, _copy.deepcopy(getattr(self, name), memo)
            )
        return result


def _make_init(cls):
    dataclass_init = cls.__init__

    def __init__(self, *args, **kwargs):
        if len(args) == 1 and not kwargs and isinstance(args[0], dict):
            dataclass_init(self)
            self.mergedict(args[0])
        elif len(args) == 1 and not kwargs and isinstance(args[0], cls):
            dataclass_init(self)
            for name in self._field_names():
                setattr(self, name, _copy.deepcopy(getattr(args[0], name)))
        else:
            dataclass_init(self, *args, **kwargs)

    return __init__


def options_dataclass(cls):
    """Decorator: dataclass + BaseOptions semantics + dict constructor.

    Usage::

        @options_dataclass
        class RANSACOptions(BaseOptions):
            max_error: float = 4.0
    """
    cls = dataclasses.dataclass(cls, eq=True, repr=True)
    cls.__init__ = _make_init(cls)
    return cls
