"""Property-based invariant: for ANY document set (random sources, token
counts including zero, bucket counts, context lengths), the distributed
packing materializer equals the obvious single-threaded concatenate-then-
chunk reference — full windows AND the partial-tail behavior."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batch_pipeline_via_lakehouse_spark.plans.packing import pack_token_windows

DOCS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # source
        st.integers(min_value=0, max_value=37),    # n_tok (0 = empty doc)
    ),
    min_size=1,
    max_size=40,
)


def _reference(docs, L, drop_partial):
    by_src = {}
    for i, (src, toks) in enumerate(docs):
        by_src.setdefault(src, []).append((i, toks))
    out = {}
    for src, items in by_src.items():
        stream = [t for _, toks in sorted(items) for t in toks]
        for b in range(0, len(stream), L):
            chunk = stream[b : b + L]
            if drop_partial and len(chunk) < L:
                continue
            out[(src, b // L)] = chunk
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    spec=DOCS,
    ctx=st.sampled_from([4, 7, 16]),
    buckets=st.sampled_from([2, 3, 8]),
    drop_partial=st.booleans(),
)
def test_pack_windows_equals_reference(spark, spec, ctx, buckets, drop_partial):
    v = 0
    docs = []
    for src, n in spec:
        docs.append((src, list(range(v, v + n))))
        v += n
    rows = [(i, toks, len(toks), src) for i, (src, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, n_tok int, source string")
    got = {
        (r.source, r.bin): list(r.tokens)
        for r in pack_token_windows(
            df, ctx_len=ctx, drop_partial=drop_partial, n_buckets=buckets
        ).collect()
    }
    assert got == _reference(docs, ctx, drop_partial)
