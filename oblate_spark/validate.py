"""Value validators compiled to Spark Column predicates.

Reimplements the semantics of the reference's ``oblate.validate`` module
(reference: oblate/validate.py — Range :151-205, Length :208-262,
Regex :265-318, Exclude :321-339, Or :342-371) as *expression builders*:
each validator emits a Column that evaluates to NULL when the value
passes and to the exact reference failure message when it fails. The
compiler turns non-NULL messages into violation rows, so errors
accumulate across validators exactly like the reference
(oblate/fields/base.py:212-224 — no fail-fast).

Each validator also carries ``py_check(value)`` — the same predicate in
plain Python — used by the staged nested-object kernel (Arrow batch,
never per-row on the Spark side) and by property tests.

Messages embedding values (Exclude, custom regex fail_message with
``{value}``) are built with string-concat expressions so they stay
inside whole-stage codegen.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .errors import ErrorCode

__all__ = [
    "Validator",
    "Range",
    "Length",
    "Regex",
    "Exclude",
    "Or",
    "ExprValidator",
    "PandasValidator",
    "field",
]

_MISSING = object()


def _sql_repr(value: Any) -> str:
    return repr(value)


class Validator:
    """Base validator.

    Parameters
    ----------
    raw:
        Raw validators run on the pre-cast source value; non-raw run on
        the loaded (coerced) value (reference oblate/schema.py:255-277).
    """

    code: str = ErrorCode.CUSTOM
    raw: bool = False

    def __init__(self, *, raw: bool = False) -> None:
        self.raw = raw

    def build(self, col: Column, field: Any = None) -> Column:
        """Return NULL-if-pass / message-string-if-fail Column."""
        raise NotImplementedError

    def py_check(self, value: Any) -> Optional[str]:
        """Plain-Python twin of :meth:`build`: None if pass, message if fail."""
        raise NotImplementedError


class Range(Validator):
    """Inclusive integer range (reference oblate/validate.py:151-205).

    ``Range(5)`` == ``Range(0, 5)``; both bounds inclusive;
    ``Range.from_standard(range(a, b))`` excludes the upper bound.
    """

    code = ErrorCode.RANGE

    def __init__(self, lb: int = _MISSING, ub: int = _MISSING, /, *, raw: bool = False) -> None:  # type: ignore[assignment]
        super().__init__(raw=raw)
        if lb is _MISSING and ub is _MISSING:
            raise TypeError("Range() must take at least one argument")
        if ub is _MISSING:
            lb, ub = 0, lb
        self.lb, self.ub = int(lb), int(ub)
        if self.lb == self.ub:
            self.message = f"Value must be equal to {self.lb}"
        else:
            self.message = f"Value must be in range {self.lb} to {self.ub} inclusive"

    @classmethod
    def from_standard(cls, obj: range, /) -> "Range":
        return cls(obj.start, obj.stop - 1)

    def build(self, col: Column, field: Any = None) -> Column:
        return F.when(~col.between(F.lit(self.lb), F.lit(self.ub)), F.lit(self.message))

    def py_check(self, value: Any) -> Optional[str]:
        return None if self.lb <= value <= self.ub else self.message


class Length(Validator):
    """Length bounds on strings / arrays / maps (reference oblate/validate.py:208-262)."""

    code = ErrorCode.LENGTH

    def __init__(
        self,
        *,
        min: int = _MISSING,  # noqa: A002 - reference API parity
        max: int = _MISSING,  # noqa: A002
        exact: int = _MISSING,
        raw: bool = False,
    ) -> None:  # type: ignore[assignment]
        super().__init__(raw=raw)
        if exact is not _MISSING:
            if min is not _MISSING or max is not _MISSING:
                raise TypeError("exact cannot be mixed with min or max")
            min = max = exact
        if min is _MISSING and max is _MISSING:
            raise TypeError("One of min, max or both parameters must be provided")
        self.min = None if min is _MISSING else int(min)
        self.max = None if max is _MISSING else int(max)
        if self.min is not None and self.min == self.max:
            self.message = f"Value length must be exactly {self.min} characters"
        elif self.min is None:
            self.message = f"Value length must be less than {self.max} characters"
        elif self.max is None:
            self.message = f"Value length must be greater than {self.min} characters"
        else:
            self.message = f"Value length must be between {self.min} to {self.max} characters"

    def _length_expr(self, col: Column, field: Any) -> Column:
        # strings -> char length; arrays/maps -> cardinality. The field
        # spec knows which; default to string length.
        if field is not None and getattr(field, "is_sized_container", False):
            return F.size(col)
        return F.length(col)

    def build(self, col: Column, field: Any = None) -> Column:
        length = self._length_expr(col, field)
        ok = F.lit(True)
        if self.min is not None:
            ok = ok & (length >= F.lit(self.min))
        if self.max is not None:
            ok = ok & (length <= F.lit(self.max))
        return F.when(~ok, F.lit(self.message))

    def py_check(self, value: Any) -> Optional[str]:
        n = len(value)
        if self.min is not None and n < self.min:
            return self.message
        if self.max is not None and n > self.max:
            return self.message
        return None


class Regex(Validator):
    """Regex validation (reference oblate/validate.py:265-318).

    Python ``re.match`` anchors at the start; ``fullmatch`` at both ends;
    ``search`` anywhere. Java's ``rlike`` is search-like, so we wrap the
    pattern: match -> ``^(?:p)``, fullmatch -> ``^(?:p)$``. Inline flags
    (``(?i)`` etc.) carry the Python ``flags`` argument into the Java
    dialect. Patterns using Python-only constructs fall back to
    ``py_check`` via a PandasValidator upstream (documented limitation).
    """

    code = ErrorCode.REGEX

    def __init__(
        self,
        pattern: str | re.Pattern,
        flags: int = 0,
        fail_message: str = "Value failed pattern validation",
        full_match: bool = False,
        search: bool = False,
        *,
        raw: bool = False,
    ) -> None:
        super().__init__(raw=raw)
        if full_match and search:
            raise TypeError("full_match and search parameters cannot be mixed")
        self._pattern = re.compile(pattern, flags) if isinstance(pattern, str) else pattern
        self._fail_message = fail_message
        self._mode = "fullmatch" if full_match else ("search" if search else "match")

        pat = self._pattern.pattern
        prefix = ""
        if self._pattern.flags & re.IGNORECASE:
            prefix += "i"
        if self._pattern.flags & re.MULTILINE:
            prefix += "m"
        if self._pattern.flags & re.DOTALL:
            prefix += "s"
        inline = f"(?{prefix})" if prefix else ""
        if self._mode == "match":
            self._java_pattern = f"{inline}^(?:{pat})"
        elif self._mode == "fullmatch":
            self._java_pattern = f"{inline}^(?:{pat})$"
        else:
            self._java_pattern = f"{inline}{pat}"

    def _message_expr(self, col: Column) -> Column:
        msg = self._fail_message
        if "{value}" in msg or "{pattern}" in msg:
            msg = msg.replace("{pattern}", str(self._pattern))
            parts = msg.split("{value}")
            exprs: list[Column] = []
            for i, part in enumerate(parts):
                if i:
                    exprs.append(col.cast("string"))
                if part:
                    exprs.append(F.lit(part))
            return F.concat(*exprs) if exprs else F.lit("")
        return F.lit(msg)

    def build(self, col: Column, field: Any = None) -> Column:
        return F.when(~col.rlike(self._java_pattern), self._message_expr(col))

    def py_check(self, value: Any) -> Optional[str]:
        fn = getattr(self._pattern, self._mode)
        if fn(value) is None:
            return self._fail_message.format(value=value, pattern=self._pattern)
        return None


class Exclude(Validator):
    """Disallowed-values check (reference oblate/validate.py:321-339)."""

    code = ErrorCode.EXCLUDE

    def __init__(self, *values: Any, raw: bool = False) -> None:
        super().__init__(raw=raw)
        self._values = values
        if len(values) == 1:
            self.message = f"Value cannot be {values[0]!r}"
        else:
            self.message = f"Value cannot be one from: {', '.join(repr(v) for v in values)}"

    def build(self, col: Column, field: Any = None) -> Column:
        return F.when(col.isin(list(self._values)), F.lit(self.message))

    def py_check(self, value: Any) -> Optional[str]:
        return self.message if value in self._values else None


class Or(Validator):
    """Passes iff any sub-validator passes (reference oblate/validate.py:342-371)."""

    code = ErrorCode.OR
    message = "All validations failed for the given value"

    def __init__(self, *validators: Validator, raw: bool = False) -> None:
        super().__init__(raw=raw)
        self._validators = validators

    def build(self, col: Column, field: Any = None) -> Column:
        any_pass = F.lit(False)
        for v in self._validators:
            any_pass = any_pass | v.build(col, field).isNull()
        return F.when(~any_pass, F.lit(self.message))

    def py_check(self, value: Any) -> Optional[str]:
        for v in self._validators:
            if v.py_check(value) is None:
                return None
        return self.message


class ExprValidator(Validator):
    """Custom validator from a Column-expression builder.

    ``fn(col)`` may return a *boolean* Column (False => generic message
    'Validation failed for this field.', matching the reference's bare
    ValueError wrapping, oblate/exceptions.py:137-148) or a *string*
    Column (NULL => pass, non-NULL => that message).
    """

    code = ErrorCode.CUSTOM

    def __init__(
        self,
        fn: Callable[[Column], Column],
        *,
        raw: bool = False,
        returns_message: bool = False,
        py_fn: Optional[Callable[[Any], Optional[str]]] = None,
    ) -> None:
        super().__init__(raw=raw)
        self._fn = fn
        self._returns_message = returns_message
        self._py_fn = py_fn

    def build(self, col: Column, field: Any = None) -> Column:
        from .contexts import current_schema_context, wants_context

        if wants_context(self._fn):
            # validator declared (col, ctx): pass the active run's
            # SchemaContext (None outside a validate() run) — reference
            # ctx.schema.context.state parity (oblate/contexts.py:42-83)
            out = self._fn(col, current_schema_context())
        else:
            out = self._fn(col)
        if self._returns_message:
            return out
        return F.when(~out, F.lit("Validation failed for this field."))

    def py_check(self, value: Any) -> Optional[str]:
        if self._py_fn is not None:
            return self._py_fn(value)
        raise NotImplementedError("ExprValidator without py_fn cannot run in the staged kernel")


class PandasValidator(Validator):
    """Arbitrary-Python validator, Arrow-batched (never per-row on Spark).

    ``fn(pd.Series) -> pd.Series[Optional[str]]`` — NULL = pass. This is
    the escape hatch for logic inexpressible as Column expressions
    (reference custom ``@validate.field`` methods, oblate/validate.py:96-143).
    """

    code = ErrorCode.CUSTOM

    def __init__(self, fn: Callable, *, raw: bool = False) -> None:
        super().__init__(raw=raw)
        self._fn = fn

    def build(self, col: Column, field: Any = None) -> Column:
        from pyspark.sql.functions import pandas_udf

        from .contexts import current_schema_context, wants_context

        fn = self._fn
        if wants_context(fn):
            # capture the run's SchemaContext by value (cloudpickle) so
            # the Arrow workers see the driver-side state snapshot
            ctx = current_schema_context()
            udf = pandas_udf(lambda s: fn(s, ctx), "string")
        else:
            # always wrap in a single-arg lambda: pandas_udf infers the
            # eval type from the signature and rejects extra
            # (defaulted) parameters without type hints — the author's
            # own defaults are not Spark's business
            udf = pandas_udf(lambda s: fn(s), "string")
        return udf(col)

    #: pyload.validate_mapping passes the kernel's compile-time context
    #: snapshot via ``ctx=`` (inside Arrow workers the driver ContextVar
    #: is unset — reading it there would hand the validator None)
    accepts_ctx = True

    def py_check(self, value: Any, ctx: Any = None) -> Optional[str]:
        import pandas as pd

        from .contexts import current_schema_context, wants_context

        if wants_context(self._fn):
            if ctx is None:
                ctx = current_schema_context()
            return self._fn(pd.Series([value]), ctx).iloc[0]
        return self._fn(pd.Series([value])).iloc[0]


def field(
    field_name: str,
    *,
    raw: bool = False,
    returns_message: bool = False,
) -> Callable:
    """Decorator registering a method validator on a Schema class, by
    field name — API parity with ``@validate.field`` (reference
    oblate/validate.py:96-143). The decorated function receives a Column
    and returns a boolean or message Column.

    Example::

        class Point(Schema):
            x = fields.Integer()

            @validate.field('x')
            def check_x(col):
                return col % 2 == 0
    """

    def wrapper(fn: Callable) -> Callable:
        fn.__validator_field__ = field_name
        fn.__validator_is_raw__ = raw
        fn.__validator_returns_message__ = returns_message
        return fn

    return wrapper
