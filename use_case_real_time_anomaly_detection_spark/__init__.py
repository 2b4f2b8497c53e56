"""PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) re-expressing the capabilities of the
reference Tinybird anomaly-detection project
(`/root/reference`, tinybirdco/use-case-real-time-anomaly-detection):
five anomaly detectors (out-of-range, rate-of-change, timeout/gap,
z-score, IQR) become declarative constraint rules evaluated over Spark
DataFrames, alongside column-stat profiling, uniqueness, referential
integrity, and KS/PSI distribution-drift checks, with violation rows and
per-partition pass/fail verdicts matching the reference's log contract
(reference: tinybird/datasources/copy_log.datasource:3-8).

Architecture is Spark-first: every rule compiles to DataFrame expressions
(Catalyst-optimizable, whole-stage-codegen-friendly); rolling statistics
use Window frames; audio payloads are decoded only inside vectorized
Arrow pandas UDFs; all row-local rules are fused into a single scan
(the reference runs five separate queries per minute and its docs lament
that cost — reference: content/copies-pipes.md:13).
"""

__version__ = "0.1.0"
