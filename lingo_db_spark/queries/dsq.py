"""Decorrelation-class query shapes (TPC-DS / JOB style) — the query
patterns the reference gates with its TPC-DS + JOB suites
(reference resources/sql/tpcds/, resources/sql/job/, CI
.github/workflows/workflow-ubuntu-latest-x86_64.yml:168-193) that the
TPC-H spine does not reach: correlated aggregates in HAVING, CTEs
consumed 3+ times, EXISTS under OR, window-over-join.  Expressed on the
driver's synthetic schema; each maps to the reference's Unnesting.cpp
decorrelation (src/compiler/Dialect/RelAlg/Transforms/Unnesting.cpp:18-333)
— here Catalyst's RewriteCorrelatedScalarSubquery / hash-aggregate +
self-join renderings, with plan tests in tests/test_dsq.py asserting no
per-row re-execution.
"""

from __future__ import annotations
