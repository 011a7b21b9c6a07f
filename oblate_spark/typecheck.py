"""Recursive type-expression validation.

A from-scratch reimplementation of the *semantics* of the reference's
``oblate.type_validation`` module (reference oblate/type_validation.py:
140-400) — same accepted type expressions, same default message strings
(the de-facto spec is /root/reference/tests/test_type_validation.py:40-53)
— but structured as a single recursive function over ``typing`` objects
instead of a class with per-origin methods.

Used in two places:

1. The public ``validate_types(types, values)`` convenience API
   (parity with oblate/type_validation.py:68-137).
2. The staged-mode container kernel: an Arrow-batched pandas UDF maps
   JSON-encoded cell values through :func:`validate_json_value`. JSON
   cannot represent ``set``/``tuple``; ``json_mode=True`` relaxes the
   structural isinstance checks so a JSON array satisfies an expected
   ``set``/``tuple``/``Sequence`` (with set-duplicate and tuple-length
   semantics preserved).
"""

from __future__ import annotations

import collections.abc
import sys
import types as _types
import warnings
from typing import (
    Any,
    Dict,
    List,
    Literal,
    Mapping,
    Tuple,
    Union,
    get_args,
    get_origin,
    get_type_hints,
)

try:  # Required/NotRequired: 3.11+ in typing
    from typing import NotRequired, Required, is_typeddict
except ImportError:  # pragma: no cover
    from typing_extensions import NotRequired, Required, is_typeddict  # type: ignore

__all__ = ["validate_types", "validate_value", "validate_json_value", "TypeValidationError"]

_PY310_UNION = getattr(_types, "UnionType", None)
_warned_types: set = set()


class TypeValidationError(Exception):
    """Raised by :func:`validate_types`; parity with the reference
    (oblate/type_validation.py:52-65)."""

    def __init__(self, errors: Dict[str, List[str]]) -> None:
        self.errors = errors
        super().__init__(
            f"Type validation failed for following keys: {', '.join(errors)}"
        )


def _type_name(tp: Any) -> str:
    return getattr(tp, "__name__", str(tp))


def _warn_unsupported(tp: Any) -> None:
    if tp in _warned_types:
        return
    _warned_types.add(tp)
    warnings.warn(
        f"Validation of {_type_name(tp)} type is not supported. No type "
        f"validation will be performed for this type by Oblate.",
        UserWarning,
        stacklevel=3,
    )


def _is_union(origin: Any) -> bool:
    return origin is Union or (_PY310_UNION is not None and origin is _PY310_UNION)


def _check_instance(value: Any, tp: type, json_mode: bool) -> bool:
    if json_mode:
        # JSON has no tuple/set — a JSON array satisfies either.
        if tp is tuple or tp is set:
            return isinstance(value, (list, tuple, set))
        if tp is float:
            return isinstance(value, float) and not isinstance(value, bool)
    return isinstance(value, tp)


def validate_value(value: Any, tp: Any, *, json_mode: bool = False) -> Tuple[bool, List[str]]:
    """Validate ``value`` against type expression ``tp``.

    Returns ``(ok, messages)`` with the reference's exact message
    formats. ``bool`` passing an ``int`` check is an inherited Python
    quirk (isinstance(True, int) is True) that the reference also has
    (oblate/fields/primitive.py:114) and we preserve.
    """
    if tp is Any:
        return True, []

    origin = get_origin(tp)

    if origin is None:
        if is_typeddict(tp):
            return _validate_typed_dict(value, tp, json_mode)
        if _check_instance(value, tp, json_mode):
            return True, []
        return False, [f"Must be of type {tp.__name__}"]

    if _is_union(origin):
        args = get_args(tp)
        for arm in args:
            ok, _ = validate_value(value, arm, json_mode=json_mode)
            if ok:
                return True, []
        names = ", ".join(_type_name(a) for a in args)
        return False, [
            f"Type of {value!r} ({type(value).__name__}) is not compatible with types ({names})"
        ]

    if origin is Literal:
        args = get_args(tp)
        if value in args:
            return True, []
        if len(args) == 1:
            return False, [f"Value must be equal to {args[0]!r}"]
        return False, [f"Value must be one of: {', '.join(repr(v) for v in args)}"]

    if origin in (Required, NotRequired):
        return validate_value(value, get_args(tp)[0], json_mode=json_mode)

    if origin is list:
        return _validate_sequence(value, tp, "list", json_mode)

    if origin is set:
        return _validate_set(value, tp, json_mode)

    if origin is tuple:
        return _validate_tuple(value, tp, json_mode)

    if origin is collections.abc.Sequence:
        if isinstance(value, tuple):
            return _validate_tuple(value, tp, json_mode)
        if isinstance(value, set):
            return _validate_set(value, tp, json_mode)
        return _validate_sequence(value, tp, "list", json_mode)

    if origin is dict or origin is collections.abc.Mapping:
        name = "Dictionary" if origin is dict else "Mapping"
        return _validate_mapping(value, tp, name, json_mode)

    _warn_unsupported(origin)
    return True, []


def _validate_sequence(value: Any, tp: Any, kind: str, json_mode: bool) -> Tuple[bool, List[str]]:
    if not isinstance(value, list):
        return False, [f"Must be a valid {kind}"]
    (vtp,) = get_args(tp) or (Any,)
    errors: List[str] = []
    for idx, item in enumerate(value):
        ok, msgs = validate_value(item, vtp, json_mode=json_mode)
        if not ok:
            errors.append(f"Sequence item at index {idx}: {msgs[0]}")
    return not errors, errors


def _validate_set(value: Any, tp: Any, json_mode: bool) -> Tuple[bool, List[str]]:
    if json_mode and isinstance(value, list):
        pass  # JSON array standing in for a set
    elif not isinstance(value, set):
        return False, ["Must be a valid set"]
    (vtp,) = get_args(tp) or (Any,)
    errors: List[str] = []
    for item in value:
        ok, msgs = validate_value(item, vtp, json_mode=json_mode)
        if not ok:
            errors.append(f"Set includes an invalid item: {msgs[0]}")
    return not errors, errors


def _validate_tuple(value: Any, tp: Any, json_mode: bool) -> Tuple[bool, List[str]]:
    if json_mode and isinstance(value, list):
        value = tuple(value)
    if not isinstance(value, tuple):
        return False, ["Must be a valid tuple"]
    args = get_args(tp)
    errors: List[str] = []
    if len(args) == 2 and args[1] is Ellipsis:
        vtp = args[0]
        for idx, item in enumerate(value):
            ok, msgs = validate_value(item, vtp, json_mode=json_mode)
            if not ok:
                errors.append(f"Tuple item at index {idx}: {msgs[0]}")
    else:
        for idx, arm in enumerate(args):
            if idx >= len(value):
                errors.append(
                    f"Tuple length must be {len(args)} (current length: {len(value)})"
                )
                break
            ok, msgs = validate_value(value[idx], arm, json_mode=json_mode)
            if not ok:
                errors.append(f"Tuple item at index {idx}: {msgs[0]}")
    return not errors, errors


def _validate_mapping(value: Any, tp: Any, name: str, json_mode: bool) -> Tuple[bool, List[str]]:
    base = dict if name == "Dictionary" else collections.abc.Mapping
    if not isinstance(value, base):
        return False, [f"Must be a valid {name.lower()}"]
    args = get_args(tp)
    ktp, vtp = (args + (Any, Any))[:2] if args else (Any, Any)
    errors: List[str] = []
    for idx, (k, v) in enumerate(value.items()):
        ok, msgs = validate_value(k, ktp, json_mode=json_mode)
        if not ok:
            errors.append(f"{name} key at index {idx}: {msgs[0]}")
            continue
        ok, msgs = validate_value(v, vtp, json_mode=json_mode)
        if not ok:
            errors.append(f"{name} value for key {k!r}: {msgs[0]}")
    return not errors, errors


def _validate_typed_dict(value: Any, tp: Any, json_mode: bool) -> Tuple[bool, List[str]]:
    if not isinstance(value, dict):
        return False, [f"Must be a {tp.__name__} dictionary"]
    hints = dict(get_type_hints(tp, include_extras=True))
    errors: List[str] = []
    for k, v in value.items():
        if k not in hints:
            errors.append(f"Invalid key {k!r}")
            continue
        hint = hints.pop(k)
        ok, msgs = validate_value(v, hint, json_mode=json_mode)
        if not ok:
            errors.append(f"Validation failed for {k!r}: {msgs[0]}")
    for k, hint in hints.items():
        origin = get_origin(hint)
        if (origin is None and not tp.__total__) or origin is NotRequired:
            continue
        errors.append(f"Key {k!r} is required")
    return not errors, errors


def validate_json_value(raw: str, tp: Any) -> List[str]:
    """Validate one JSON-encoded cell against ``tp``; returns failure
    messages ([] = pass). Called from inside an Arrow batch, never
    per-row on the Spark side."""
    import json

    try:
        value = json.loads(raw)
    except (ValueError, TypeError):
        return ["Must be valid JSON"]
    expected = get_origin(tp) or tp
    if expected is tuple and isinstance(value, list):
        value = tuple(value)
    ok, msgs = validate_value(value, tp, json_mode=True)
    return msgs


def validate_types(
    types: Mapping[str, Any],
    values: Mapping[str, Any],
    *,
    ignore_extra: bool = False,
    ignore_missing: bool = False,
) -> None:
    """Standalone dict-of-types vs dict-of-values validation; API parity
    with ``oblate.validate_types`` (oblate/type_validation.py:68-137)."""
    pending = dict(types)
    key_errors: Dict[str, List[str]] = {}

    for key, value in values.items():
        if key not in pending:
            if not ignore_extra:
                key_errors[key] = ["Invalid key"]
            continue
        tp = pending.pop(key)
        ok, errors = validate_value(value, tp)
        if not ok:
            key_errors[key] = errors

    if not ignore_missing:
        for key in pending:
            key_errors[key] = ["This key is missing."]

    if key_errors:
        raise TypeValidationError(key_errors)
