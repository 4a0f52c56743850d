"""pandera_unified_validator_spark — a PySpark-native schema + constraint
validation and data-quality engine.

From-scratch rebuild of the capabilities of
``iAn-P1nt0/pandera-unified-validator`` (see SURVEY.md), re-expressed as
declarative Spark plans: one codegen pass for row-local checks, broadcast
joins for uniqueness/referential checks, single-aggregation profiling,
partition-group streaming with checkpoint/resume, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.
"""

from .plans.schema import (
    ColumnSpec,
    ConditionalCheck,
    CrossColumnCheck,
    CustomCheck,
    SchemaBuilder,
    ValidationSchema,
)
from .operators.validator import (
    SparkValidator,
    ValidationFailedError,
    ValidationResult,
)
from .utils.reporting import (
    CheckResult,
    ValidationMetrics,
    ValidationReport,
    to_opentelemetry,
    to_prometheus,
)
from .operators.profiler import DataProfiler, ProfileReport
from .operators.drift import DriftReport, compare_profiles, numeric_drift, token_frequency_drift
from .operators.pipeline import CurationConfig, curate_corpus
from .streaming.runner import PartitionedValidationRunner, StreamingResult
from .session import get_spark
from .utils.cache import operator_cache_scope, release_operator_caches
from .utils.logging_config import configure_logging, get_logger

__version__ = "0.1.0"

__all__ = [
    "ColumnSpec",
    "CustomCheck",
    "CrossColumnCheck",
    "ConditionalCheck",
    "SchemaBuilder",
    "ValidationSchema",
    "SparkValidator",
    "ValidationResult",
    "ValidationFailedError",
    "ValidationReport",
    "ValidationMetrics",
    "CheckResult",
    "to_prometheus",
    "to_opentelemetry",
    "get_spark",
    "DataProfiler",
    "ProfileReport",
    "DriftReport",
    "compare_profiles",
    "numeric_drift",
    "token_frequency_drift",
    "PartitionedValidationRunner",
    "StreamingResult",
    "configure_logging",
    "get_logger",
    "operator_cache_scope",
    "release_operator_caches",
    "CurationConfig",
    "curate_corpus",
]
