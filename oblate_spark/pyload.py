"""Python twin of the staged cast kernel, used ONLY inside Arrow batches.

The Spark-side hot path compiles every check to Column expressions
(compiler.py). Deeply-nested ``Object`` fields and arbitrary type
expressions over *semi-structured* (JSON-staged) input are the one place
the reference's recursive, value-shape-dependent semantics
(oblate/schema.py:170-284 applied recursively through
oblate/fields/nesting.py:106-115) can't be expressed as static Column
trees — those run here, vectorized over Arrow batches via a pandas UDF,
never per-row on the Spark side.

Every function mirrors the reference's load pipeline order
(oblate/schema.py:226-284): none-check -> raw validators -> type
load/coercion -> non-raw validators, with full error accumulation.
"""

from __future__ import annotations

from typing import Any, List, Tuple

from .errors import ErrorCode
from .typecheck import validate_value

__all__ = ["load_field_value", "validate_mapping"]

Err = Tuple[str, str, str]  # (relative_key, error_code, message)


def load_field_value(field: Any, value: Any) -> Tuple[Any, List[Err]]:
    """Load one raw Python value through ``field``'s type kernel.

    Returns ``(loaded_value, errors)``; errors use relative key ''
    (the field itself). Mirrors Field.value_load dispatch
    (reference oblate/fields/*.py)."""
    from . import fields as f

    def err(code: str, msg: str) -> Tuple[Any, List[Err]]:
        return None, [("", code, msg)]

    if isinstance(field, f.String):
        if isinstance(value, str):
            return value, []
        if field.strict:
            return err(ErrorCode.STRING_INVALID_DATATYPE, "Value must be a string")
        return str(value), []

    if isinstance(field, f.Integer):
        if isinstance(value, int) and not isinstance(value, bool):
            return value, []
        if isinstance(value, bool):  # bool quirk: passes strict Integer
            return int(value), []
        if field.strict:
            return err(ErrorCode.INTEGER_INVALID_DATATYPE, "Value must be an integer")
        try:
            return int(value), []
        except Exception:
            return err(
                ErrorCode.INTEGER_COERCION_FAILED, f"Failed to coerce {value!r} to integer"
            )

    if isinstance(field, f.Float):
        if isinstance(value, float):
            return value, []
        if field.strict:
            return err(
                ErrorCode.FLOAT_INVALID_DATATYPE, "Value must be a floating point number"
            )
        try:
            return float(value), []
        except Exception:
            return err(ErrorCode.FLOAT_COERCION_FAILED, f"Failed to coerce {value!r} to float")

    if isinstance(field, f.Boolean):
        if isinstance(value, bool):
            return value, []
        if field.strict:
            return err(ErrorCode.BOOLEAN_INVALID_DATATYPE, "Value must be a boolean")
        s = str(value)
        if s in field._true_values:
            return True, []
        if s in field._false_values:
            return False, []
        return err(ErrorCode.BOOLEAN_COERCION_FAILED, f"Failed to coerce {s!r} to boolean")

    if isinstance(field, f.Literal):
        if value in field.values:
            return value, []
        return err(ErrorCode.LITERAL_INVALID_VALUE, field.message)

    if isinstance(field, f.Object):
        if isinstance(value, dict):
            nested = validate_mapping(field.schema_cls, value)
            return value, nested
        return err(ErrorCode.OBJECT_INVALID_DATATYPE, field.invalid_message)

    if isinstance(field, f.Any_):
        return value, []

    tp = field.type_expr() if hasattr(field, "type_expr") else None
    if tp is not None:
        expected = tp
        if isinstance(field, f.Tuple) and isinstance(value, list):
            value = tuple(value)
        ok, msgs = validate_value(value, expected, json_mode=True)
        code = getattr(field, "invalid_code", ErrorCode.TYPE_EXPR_FAILED)
        return (value if ok else None), [("", code, m) for m in msgs]

    return value, []


def validate_mapping(schema_cls: Any, data: Any, ctx: Any = None) -> List[Err]:
    """Validate a raw mapping against a Schema class — the Python twin of
    the plan's row pipeline, for nested Objects inside the Arrow kernel.
    Reproduces reference oblate/schema.py:170-284 ordering and messages.

    ``ctx`` is the compile-time SchemaContext snapshot captured into the
    kernel closure — inside an Arrow worker the driver's ContextVar is
    unset, so context-aware validators receive it explicitly."""
    errors: List[Err] = []
    if not isinstance(data, dict):
        return [("", ErrorCode.OBJECT_INVALID_DATATYPE, "Value must be a mapping")]

    load_fields = {fl.load_key: fl for fl in schema_cls.__fields__.values()}
    seen: set[str] = set()

    for key, value in data.items():
        field = load_fields.get(key)
        if field is None:
            if not schema_cls.__config__.ignore_extra:
                errors.append((key, ErrorCode.UNKNOWN_FIELD, "Invalid or unknown field."))
            continue
        seen.add(key)

        if value is None:
            if not field.none:
                errors.append(
                    (key, ErrorCode.NONE_DISALLOWED, "This field must not be None.")
                )
            continue

        # raw validators see the pre-cast value (schema.py:255-266)
        for v in field.walk_validators(raw=True):
            msg = v.py_check(value, ctx=ctx) if getattr(v, "accepts_ctx", False) else v.py_check(value)
            if msg is not None:
                errors.append((key, v.code, msg))

        loaded, type_errors = load_field_value(field, value)
        if type_errors:
            for rel, code, msg in type_errors:
                path = key if rel == "" else f"{key}.{rel}"
                errors.append((path, code, msg))
            continue  # load failed: non-raw validators don't run (schema.py:267-277)

        for v in field.walk_validators(raw=False):
            msg = v.py_check(loaded, ctx=ctx) if getattr(v, "accepts_ctx", False) else v.py_check(loaded)
            if msg is not None:
                errors.append((key, v.code, msg))

    for key, field in load_fields.items():
        if key in seen:
            continue
        if field.required:
            errors.append((key, ErrorCode.FIELD_REQUIRED, "This field is required."))
        # defaults fill silently (schema.py:204-206)

    return errors
