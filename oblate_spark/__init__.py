"""oblate_spark — a PySpark-native schema + constraint validation engine.

A from-scratch reimplementation of the *semantics* of izxxr/oblate
(reference at /root/reference; a single-process row-at-a-time Python
validation library) as distributed DataFrame operators, extended per
BASELINE.json's north rule with table-level constraints (column stats,
uniqueness, referential integrity, distribution drift) and vectorized
image-payload checks over binary columns.

Quick start::

    from oblate_spark import Schema, fields, validate
    from oblate_spark.engine import validate as run

    class Images(Schema):
        image_id = fields.String()
        w = fields.Integer(validators=[validate.Range(1, 4096)])
        caption = fields.String(validators=[validate.Length(max=120)])

    result = Images.validate(df)
    result.violations.show()
    result.verdicts().show()
"""

from . import fields, validate
from .contexts import SchemaContext, current_schema_context
from .engine import ValidationResult, raw_from_violations, validate as validate_df
from .errors import ErrorCode, ErrorContext, FieldNotSet
from .fields import MISSING
from .schema import GlobalConfig, Schema, SchemaConfig, config
from .typecheck import TypeValidationError, validate_types
from .update import FrozenError, UpdateRejected

__version__ = "0.1.0"

__all__ = [
    "Schema",
    "SchemaConfig",
    "GlobalConfig",
    "config",
    "fields",
    "validate",
    "validate_df",
    "validate_types",
    "TypeValidationError",
    "ValidationResult",
    "SchemaContext",
    "current_schema_context",
    "ErrorCode",
    "ErrorContext",
    "FieldNotSet",
    "MISSING",
]
