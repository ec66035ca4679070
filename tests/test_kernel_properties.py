"""Hypothesis property tests: the vector kernels against a numpy
reference implementation over generated inputs (SURVEY §5.3 —
property-based coverage the reference entirely lacks)."""

from __future__ import annotations

import math
import os
import sys

from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.functions.vector import (  # noqa: E402
    dot,
    sq_euc_dist,
)

finite_f = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False, width=32
)
vec_pair = st.integers(min_value=1, max_value=24).flatmap(
    lambda n: st.tuples(
        st.lists(finite_f, min_size=n, max_size=n),
        st.lists(finite_f, min_size=n, max_size=n),
    )
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=vec_pair)
def test_kernels_match_numpy(spark, pair):
    a, b = pair
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        dot("a", "b").alias("d"),
        sq_euc_dist("a", "b").alias("e"),
    ).collect()[0]
    import numpy as np

    na = np.array(a, dtype=np.float32).astype(np.float64)
    nb = np.array(b, dtype=np.float32).astype(np.float64)
    assert math.isclose(row.d, float(na @ nb), rel_tol=1e-9, abs_tol=1e-6)
    assert math.isclose(
        row.e, float(((na - nb) ** 2).sum()), rel_tol=1e-9, abs_tol=1e-6
    )
