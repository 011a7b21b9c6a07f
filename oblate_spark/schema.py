"""Schema DSL: declarative field classes compiled to validation plans.

API parity with the reference's ``Schema`` (oblate/schema.py:86-154):
fields declared as class attributes, collected by a metaclass into
``__fields__`` (by attribute name) and ``__load_fields__`` (by load_key),
inherited across subclasses, with ``@validate.field``-decorated methods
attached to their fields. One reference ``Schema(data)`` call validates
one mapping; here one ``Schema.validate(df)`` call validates a whole
DataFrame — a Schema instance corresponds to a row.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame

from .fields import Field
from .validate import ExprValidator

__all__ = ["Schema", "SchemaConfig", "GlobalConfig", "config"]


class SchemaConfig:
    """Per-schema config (reference oblate/configs.py:152-187).

    ``add_repr``/``slotted`` are accepted for API parity but are no-ops
    in a columnar engine (Tungsten owns the memory layout).
    """

    def __init__(
        self,
        *,
        ignore_extra: bool = False,
        frozen: bool = False,
        add_repr: bool = True,
        slotted: bool = True,
    ) -> None:
        self.ignore_extra = ignore_extra
        self.frozen = frozen
        self.add_repr = add_repr
        self.slotted = slotted


class GlobalConfig:
    """Process-global config (reference oblate/configs.py:84-148)."""

    def __init__(self) -> None:
        self.warn_unsupported_types = True
        #: pluggable violation-report formatter: callable(violation row
        #: as dict) -> display string, applied by ValidationResult.raw()
        self.violation_formatter = None
        #: pluggable rejection class used by engine raise sites
        #: (update.UpdateRejected subclass required — the distributed
        #: analogue of reference config.validation_error_cls,
        #: oblate/configs.py:113-125)
        self.update_rejected_cls = None


config = GlobalConfig()


class SchemaMeta(type):
    def __new__(mcls, name: str, bases: tuple, ns: dict) -> type:
        cls = super().__new__(mcls, name, bases, ns)

        fields: dict[str, Field] = {}
        for base in reversed(cls.__mro__[1:]):
            base_fields = getattr(base, "__fields__", None)
            if base_fields:
                # subclasses get *copies* so mutating validators on a child
                # never affects the parent (reference oblate/schema.py:140-147)
                for k, f in base_fields.items():
                    fields[k] = f.copy()

        for k, v in ns.items():
            if isinstance(v, Field):
                v._bind(k)
                fields[k] = v

        cls.__fields__ = fields
        cls.__load_fields__ = {f.load_key: f for f in fields.values()}

        if "__config__" not in ns:
            inherited = getattr(cls, "__config__", None)
            cls.__config__ = inherited if inherited is not None else SchemaConfig()

        # attach @validate.field-decorated methods (reference
        # oblate/schema.py:155-165, validate.py:96-143)
        for k, v in ns.items():
            target = getattr(v, "__validator_field__", None)
            if target is not None:
                if target not in fields:
                    raise TypeError(f"@validate.field({target!r}): no such field on {name}")
                fields[target].add_validator(
                    ExprValidator(
                        v,
                        raw=v.__validator_is_raw__,
                        returns_message=v.__validator_returns_message__,
                    )
                )

        return cls


class Schema(metaclass=SchemaMeta):
    """Declarative schema; one class == one table contract.

    Usage::

        class Images(Schema):
            image_id = fields.String()
            w = fields.Integer(validators=[validate.Range(1, 4096)])
            caption = fields.String(none=False, validators=[validate.Length(max=120)])

        result = Images.validate(df)            # typed columns
        result = Images.validate(df, mode="staged")  # JSON-staged columns
    """

    __fields__: dict[str, Field] = {}
    __load_fields__: dict[str, Field] = {}
    __config__: SchemaConfig = SchemaConfig()

    @classmethod
    def preprocess_data(cls, df: DataFrame) -> DataFrame:
        """User hook: rewrite the raw frame before any validation —
        parity with the reference's ``preprocess_data``
        (oblate/schema.py:171-174,295-317). Default: identity."""
        return df

    @classmethod
    def __schema_post_init__(cls, result) -> None:
        """Post-validation hook (reference oblate/schema.py:224,319-327):
        called once on the driver with the ValidationResult after the
        plan is built — the natural place to emit metrics or register
        listeners. Default: no-op. NOTE: the result is lazy; calling
        ``result.metrics()`` here triggers a job."""

    @classmethod
    def validate(
        cls,
        df: DataFrame,
        *,
        mode: str = "typed",
        row_id: Optional[str] = None,
        extra_columns_ok: tuple[str, ...] = ("row_id",),
        ignore_extra: Optional[bool] = None,
        state: Any = None,
    ):
        """Validate ``df`` against this schema.

        ``state``: arbitrary per-run user state (reference
        ``Schema(data, state=...)`` → ``schema.context.state``,
        oblate/contexts.py:42-83). Available to custom validators that
        declare a second parameter, to ``format_error`` overrides via
        ``ErrorContext.context``, and afterwards as
        ``result.context.state``."""
        from .engine import validate as _validate

        result = _validate(
            cls.preprocess_data(df),
            cls,
            mode=mode,
            row_id=row_id,
            extra_columns_ok=extra_columns_ok,
            ignore_extra=ignore_extra,
            state=state,
        )
        cls.__schema_post_init__(result)
        return result

    @classmethod
    def spark_schema(cls):
        """Expected StructType in typed mode (None-typed fields excluded)."""
        from pyspark.sql import types as T

        out = []
        for f in cls.__fields__.values():
            st = f.spark_type()
            if st is not None:
                out.append(T.StructField(f.load_key, st, nullable=True))
        return T.StructType(out)

    @classmethod
    def dump(
        cls,
        df: DataFrame,
        *,
        include: Optional[list[str]] = None,
        exclude: Optional[list[str]] = None,
    ) -> DataFrame:
        """Serialize: project validated columns, rename by dump_key
        (reference oblate/schema.py:438-503). include/exclude are
        mutually exclusive, like the reference (:463-469)."""
        if include is not None and exclude is not None:
            raise TypeError("include and exclude parameters cannot be mixed")
        names = list(cls.__fields__)
        if include is not None:
            unknown = set(include) - set(names)
            if unknown:
                raise ValueError(f"unknown fields in include: {sorted(unknown)}")
            names = [n for n in names if n in include]
        if exclude is not None:
            unknown = set(exclude) - set(names)
            if unknown:
                raise ValueError(f"unknown fields in exclude: {sorted(unknown)}")
            names = [n for n in names if n not in exclude]
        cols = []
        from pyspark.sql import functions as F

        for n in names:
            f = cls.__fields__[n]
            if f.load_key in df.columns:
                cols.append(F.col(f.load_key).alias(f.dump_key))
        return df.select(*cols)
