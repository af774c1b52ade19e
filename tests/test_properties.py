"""Property-based invariants (SURVEY §5.2.5) on random frontiers:
the Spark scheduler must equal a 10-line Python reference on every
generated input — budgets never exceeded, ranks = sorted order, the
deferred+scheduled split partitions the input."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_go_spark.operators.politeness import schedule_round

row = st.tuples(
    st.integers(0, 3),          # host id
    st.integers(0, 2),          # round
    st.integers(0, 20),         # parent_seq
    st.integers(0, 10),         # link_pos
    st.integers(0, 2),          # not_before_round
)


@given(st.lists(row, min_size=1, max_size=60, unique=True), st.integers(1, 5))
@settings(max_examples=12, deadline=None)
def test_schedule_matches_python_reference(spark, rows, budget):
    data = [
        (
            f"https://h{h}.test/p{i}",
            f"https://h{h}.test/p{i}",
            i,
            f"h{h}.test",
            f"/p{i}",
            r,
            ps,
            lp,
            0,
            nbr,
        )
        for i, (h, r, ps, lp, nbr) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "url string, url_norm string, url_hash long, host string, path string,"
        "round int, parent_seq long, link_pos int, attempts int, not_before_round int",
    )
    budgets = spark.createDataFrame(
        [], "host string, max_fetches_per_round int, crawl_delay_ms int"
    )
    scheduled, deferred = schedule_round(
        df, budgets, current_round=2, default_budget=budget
    )
    got = {
        (r.url_norm, r.host_rank) for r in scheduled.select("url_norm", "host_rank").collect()
    }
    n_deferred = deferred.count()

    # python reference
    ready = [d for d in data if d[9] <= 2]
    by_host: dict[str, list] = {}
    for d in ready:
        by_host.setdefault(d[3], []).append(d)
    expected = set()
    exp_deferred = len(data) - len(ready)
    for _host, hrows in by_host.items():
        hrows.sort(key=lambda d: (d[5], d[6], d[7], d[2]))
        for rank, d in enumerate(hrows, start=1):
            if rank <= budget:
                expected.add((d[1], rank))
            else:
                exp_deferred += 1
    assert got == expected
    assert n_deferred == exp_deferred


def test_synth_flat_matches_scalar_contract():
    """The flat Arrow-path synthesis (worldgen.synth_flat) is bit-identical
    to the scalar spans_of/status_of/... functions under the kernel's
    contract: spans only for non-error status-200 non-blocked pages,
    outlinks = link spans in document order."""
    from webcrawler_go_spark.worldgen import (
        BOT_PHRASE,
        World,
        error_class_of,
        spans_of,
        status_of,
        synth_flat,
    )

    world = World(n_hosts=24, pages_per_host=40, max_links=12)
    urls = [f"https://host-{h:04d}.test/page/{p}" for h in range(24) for p in range(30)]
    f = synth_flat(world, urls)
    for i, u in enumerate(urls):
        s = status_of(world, u)
        exp = []
        if error_class_of(world, u) is None and s == 200:
            sp = spans_of(world, u)
            if not any(BOT_PHRASE in t for k, t, _m, _o in sp if k == "text"):
                exp = sp
        got = [
            (f["sp_kind"][j], f["sp_text"][j], f["sp_media"][j], int(f["sp_off"][j]))
            for j in range(f["sp_offsets"][i], f["sp_offsets"][i + 1])
        ]
        assert got == exp, u
        exp_ol = [m for k, _t, m, _o in exp if k == "link"]
        got_ol = list(f["ol_vals"][f["ol_offsets"][i]:f["ol_offsets"][i + 1]])
        assert got_ol == exp_ol, u


def test_synth_flat_arrow_matches_numpy():
    """The Arrow-kernel string materialization (production path) is
    bit-identical to the numpy object-array path across every buffer."""
    from webcrawler_go_spark.worldgen import World, synth_flat, synth_flat_arrow

    world = World(n_hosts=24, pages_per_host=40, max_links=12)
    urls = [f"https://host-{h:04d}.test/page/{p}" for h in range(24) for p in range(25)]
    a = synth_flat(world, urls)
    b = synth_flat_arrow(world, urls)
    assert list(a["sp_kind"]) == b["sp_kind"].to_pylist()
    assert list(a["sp_text"]) == b["sp_text"].to_pylist()
    assert list(a["sp_media"]) == b["sp_media"].to_pylist()
    assert list(a["ol_vals"]) == b["ol_vals"].to_pylist()
    assert list(a["ctype"]) == b["ctype"].to_pylist()
    assert list(a["err"]) == b["err"].to_pylist()
    assert (a["sp_offsets"] == b["sp_offsets"]).all()
    assert (a["sp_off"] == b["sp_off"]).all()
    assert (a["ol_offsets"] == b["ol_offsets"]).all()
    assert (a["status"] == b["status"]).all()
    assert (a["blocked"] == b["blocked"]).all()


@given(data=st.binary(max_size=4000))
@settings(max_examples=60, deadline=None)
def test_pdf_stream_codecs_roundtrip_arbitrary_bytes(data):
    """Property: every supported PDF stream codec round-trips arbitrary
    byte strings (LZW exercises width growth on incompressible input)."""
    from webcrawler_go_spark.operators.doc_extract import (
        _ascii85_decode,
        _ascii85_encode,
        _ascii_hex_decode,
        _ascii_hex_encode,
        _lzw_decode,
        _lzw_encode,
        _rle_decode,
        _rle_encode,
    )

    assert _lzw_decode(_lzw_encode(data)) == data
    assert _rle_decode(_rle_encode(data)) == data
    assert _ascii_hex_decode(_ascii_hex_encode(data)) == data
    assert _ascii85_decode(_ascii85_encode(data)) == data


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, seed):
    """Property: encode→decode is identity for arbitrary RGB images and
    per-row filter choices (covers all writer-supported filter types)."""
    from webcrawler_go_spark.functions.media_codecs import decode_png, encode_png

    px = bytes((seed * 31 + j * 7 + (j >> 3)) % 256 for j in range(w * h * 3))
    filters = [(seed + y) % 3 for y in range(h)]
    got = decode_png(encode_png(w, h, px, channels=3, row_filters=filters))
    assert got == (w, h, 3, px)
