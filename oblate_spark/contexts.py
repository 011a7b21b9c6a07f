"""Per-run schema context — reference parity for ``SchemaContext.state``
(reference oblate/contexts.py:42-83: ``Schema(data, state=...)`` makes
user state available to validators and hooks via
``ctx.schema.context.state``).

The reference's SchemaContext rides on a Schema *instance*; in this
engine a "run" is one ``Schema.validate(df, state=...)`` call and the
context is made available three ways:

* on the returned ``ValidationResult`` as ``.context``;
* to custom validator callables (``ExprValidator`` /
  ``PandasValidator`` / ``@validate.field`` methods) that declare a
  second parameter — they receive the SchemaContext after the Column /
  Series argument;
* to ``format_error`` overrides via ``ErrorContext.context``.

Like the reference (which threads contexts through ``contextvars`` —
oblate/utils.py ``current_context``/``current_schema``), the active
run's context is published in a ContextVar for the duration of plan
compilation. Validators built as Column expressions run on the driver
exactly once per plan, so reading state here is free; PandasValidator
closures capture the context by value (cloudpickle) for the Arrow
workers.
"""

from __future__ import annotations

import contextvars
import copy
import inspect
import warnings
from typing import Any, Callable, Optional

__all__ = ["SchemaContext", "current_schema_context"]


class SchemaContext:
    """State of one ``validate()`` run (reference oblate/contexts.py:42-83).

    Attributes
    ----------
    schema:
        The Schema *class* the run validates against.
    config:
        Its ``SchemaConfig``.
    state:
        Arbitrary user state passed as ``Schema.validate(df, state=...)``;
        ``None`` by default. Mutable — validators may read and write it
        during plan compilation (driver-side).
    """

    __slots__ = ("schema", "config", "state", "_initialized")

    def __init__(self, schema: Any, state: Any = None) -> None:
        self.schema = schema
        self.config = getattr(schema, "__config__", None)
        self.state = state
        self._initialized = False

    def is_initialized(self) -> bool:
        """True once the run's plan has been compiled successfully
        (reference ``SchemaContext.is_initialized``)."""
        return self._initialized

    def _copy(self, schema: Any) -> "SchemaContext":
        ctx = self.__class__(schema=schema, state=copy.copy(self.state))
        ctx._initialized = True
        return ctx


_current: contextvars.ContextVar[Optional[SchemaContext]] = contextvars.ContextVar(
    "oblate_spark_schema_context", default=None
)


def current_schema_context() -> Optional[SchemaContext]:
    """The SchemaContext of the ``validate()`` run currently being
    compiled, or None outside one."""
    return _current.get()


def _set_current(ctx: Optional[SchemaContext]) -> contextvars.Token:
    return _current.set(ctx)


def _reset_current(token: contextvars.Token) -> None:
    _current.reset(token)


#: defaulted second-parameter names that still opt in to receiving the
#: SchemaContext (``def v(col, ctx=None)`` is a natural spelling)
_CTX_PARAM_NAMES = frozenset({"ctx", "context", "schema_context"})


def wants_context(fn: Callable) -> bool:
    """True if ``fn`` declares a second positional parameter for the
    SchemaContext after its Column/Series argument.

    Opt-in rules: a REQUIRED (default-less) second positional always
    opts in; a defaulted second positional opts in only when its NAME
    says so (``ctx``/``context``/``schema_context``). A validator like
    ``lambda col, lo=0: col >= lo`` keeps its historical one-argument
    call (the default is the author's own parameter, not a context
    slot), and ``*args`` signatures are never treated as a context
    request — both would otherwise receive a SchemaContext in a slot
    that expects user data.

    Migration note (name-based opt-in introduced after the 'any second
    positional' rule): a validator written as ``def v(col, cfg=None)``
    that previously received the SchemaContext now receives only one
    argument. Rename the parameter to ``ctx``/``context``/
    ``schema_context`` to keep receiving it. A one-time UserWarning is
    emitted per function when a defaulted, non-context-named second
    positional is seen, so the change is never silent."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):  # builtins / C callables
        return False
    positional = [
        p
        for p in sig.parameters.values()
        if p.kind
        in (inspect.Parameter.POSITIONAL_ONLY, inspect.Parameter.POSITIONAL_OR_KEYWORD)
    ]
    if len(positional) < 2:
        return False
    second = positional[1]
    if second.default is inspect.Parameter.empty:
        return True
    if second.name in _CTX_PARAM_NAMES:
        return True
    key = getattr(fn, "__code__", None) or fn
    try:
        seen = key in _warned_ambiguous
        if not seen:
            _warned_ambiguous.add(key)
    except TypeError:  # unhashable callable instance: warn every time
        seen = False
    if not seen:
        warnings.warn(
            f"validator {getattr(fn, '__qualname__', fn)!r} has a defaulted "
            f"second positional parameter {second.name!r}: it is treated as "
            "the author's own default, NOT a SchemaContext slot. Rename it to "
            "ctx/context/schema_context if the validator needs the context.",
            UserWarning,
            stacklevel=3,
        )
    return False


#: functions already warned about an ambiguous defaulted second
#: positional (keyed on the code object so equal lambdas re-created per
#: call still warn only once per definition site)
_warned_ambiguous: set = set()
