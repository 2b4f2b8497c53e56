from .rules import (  # noqa: F401
    AudioDecodeRule,
    CalibratedRangeRule,
    DriftRule,
    GapRule,
    IqrRule,
    NotNullRule,
    ProfileSpec,
    RangeRule,
    RateOfChangeRule,
    RefIntegrityRule,
    Rule,
    TranscriptDistanceRule,
    TranscriptRule,
    UniqueRule,
    ValueSetRule,
    ZScoreRule,
)
from .compiler import CompiledPlan, compile_rules  # noqa: F401
from .engine import RunResult, ValidationEngine  # noqa: F401
from .limit_by import limit_by  # noqa: F401
