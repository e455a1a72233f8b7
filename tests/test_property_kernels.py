"""Hypothesis property tests for the PURE vectorized kernels (no Ray in
the loop — these are the numpy folds the bucket shuffles rely on, so a
randomized counterexample here would silently corrupt distributed
results)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raycdc.ops import _run_boundaries


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
        min_size=0, max_size=60,
    )
)
def test_run_boundaries_matches_naive(keys):
    keys = sorted(keys, key=lambda v: (v is not None, v))  # sorted, nulls first
    col = pa.array(keys, type=pa.int64())
    got = _run_boundaries(col, len(keys))
    want = np.ones(len(keys), dtype=bool)
    for i in range(1, len(keys)):
        a, b = keys[i - 1], keys[i]
        want[i] = not (a == b or (a is None and b is None))
    assert (got == want).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=8),
)
def test_rolling_sum_kernel_matches_naive(vals, window):
    # the cumsum-difference ROWS-frame kernel from grouped_rolling_sum,
    # single key run
    v = np.asarray(vals, dtype=np.int64)
    n = len(v)
    c0 = np.concatenate([[0], np.cumsum(v)])
    lo = np.maximum(0, np.arange(n) - (window - 1))
    got = c0[1:] - c0[lo]
    want = [sum(vals[max(0, i - window + 1): i + 1]) for i in range(n)]
    assert got.tolist() == want


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    from raycdc.extras.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(pix)) == pix).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=500),
                  st.sampled_from(["a", "b", "c", "x"])),
        min_size=0, max_size=40,
    ),
    st.one_of(st.none(), st.integers(min_value=0, max_value=200)),
)
def test_funnel_single_key_matches_naive(events, window):
    # greedy-earliest chain semantics on ONE key, vs a direct recompute
    from raycdc.ops import funnel_steps
    import ray.data as rd

    steps = ["a", "b", "c"]
    ts = np.array([t for t, _ in events], dtype=np.float64)
    et = [e for _, e in events]

    def naive():
        reached, prev, t1 = 0, -np.inf, None
        for si, s in enumerate(steps):
            cand = [t for t, e in zip(ts, et)
                    if e == s and t > prev
                    and (window is None or t1 is None or t <= t1 + window)]
            if not cand:
                break
            prev = min(cand)
            if si == 0:
                t1 = prev
            reached = si + 1
        return reached

    t = pa.table(
        {
            "k": pa.array(np.zeros(len(events), dtype=np.int64)),
            "us": pa.array(ts.astype(np.int64)),
            "e": pa.array(et),
        }
    )
    if t.num_rows == 0:
        return
    out = funnel_steps(
        rd.from_arrow(t), "k", "us", "e", steps=steps, window=window, num_buckets=2
    ).to_pandas()
    assert int(out["steps_reached"].iloc[0]) == naive()
