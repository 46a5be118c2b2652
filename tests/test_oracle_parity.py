"""Every declared query must hash-match its DuckDB oracle — the local
replica of the driver's t2 correctness gate (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from mldb_spark.oracles import ORACLES
from mldb_spark.queries import QUERIES
from mldb_spark.testing import compare_spark_duck


# deliberately rows-only: engine-internal hashes (xxhash64 simhash),
# seeded-plane LSH, and MLlib estimators (kmeans||/LBFGS/eigensolver
# internals) have no cross-engine SQL replay; their real verification
# lives in tests/test_operators.py and tests/test_ml.py invariants
ROWS_ONLY = {
    "q75_tsne",            # iterative embedding, no closed-form replay
    "qa07_pack_sequences",  # FFD bin assignment is imperative; invariants in test_corpus.py
}
# q67 graduated r9 (VERDICT r8 #3): exported (weights, means,
# precision matrices, log-dets) at the gate's 8-dim slice; oracle
# replays the argmax log-density assignment closed-form
# q80/q85/q86 graduated r7 via exported-kernel fixtures (VERDICT r6 #4)
# q87/q76/q79/q61 graduated r8 the same way (VERDICT r7 #1): centroid /
# cell-assignment / word-vector / term-loading fixtures, oracle replays
# the assignment/probe/pooling/prune logic closed-form
# q65 graduated r8 via the exported-OUTPUT pattern (per-example
# scores fixture; oracle replays the full AUC/accuracy evaluation)
# q74 graduated r8: per-fold coefficient fixtures, oracle replays the
# whole fold harness (assignment, held-out scoring, AUC, counts)
# q66/q68/q88/q89 graduated r8: hyperplane / classifier+Platt /
# logistic / PCA-component fixtures; oracles replay margin scoring,
# the two-sigmoid calibration chain, exact rank-sum AUC + accuracy,
# and the explained-variance eigenvalue/trace ratio closed-form


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert missing == set(), f"queries without oracle entries: {missing}"


def test_every_oracle_has_a_query():
    orphans = set(ORACLES) - set(QUERIES)
    assert orphans == set(), f"oracles without queries: {orphans}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, duck, sf_dir):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    problems = compare_spark_duck(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
    assert problems == [], f"{name}: {problems}"
