"""Rule engine semantics (reference: ClinicalTrialsAttributes rule table +
ModifyDICOMTags dynamic properties — SURVEY.md §2.2 M4/M7)."""

import pyarrow as pa
import pytest

from raycdc.rules import BUILTIN_FNS, Rule, RuleSet
from raycdc.synth import base_table


def small():
    return base_table(20, seed=3, min_len=4, max_len=8)


def test_replace_null_remove_rename():
    rs = RuleSet.from_config(
        {
            "rules": [
                {"column": "source", "action": "replace", "value": "redacted"},
                {"column": "n_tok", "action": "null"},
                {"column": "nonexistent", "action": "remove"},  # present-only no-op
                {"column": "doc_id", "action": "rename", "value": "key"},
            ]
        }
    )
    out = rs(small())
    assert set(out["source"].to_pylist()) == {"redacted"}
    assert out["n_tok"].null_count == 20
    assert "key" in out.column_names and "doc_id" not in out.column_names


def test_token_transforms_and_derive_order():
    # derive n_tok AFTER dropping 2 tokens: ordered phases matter
    rs = RuleSet.from_config(
        {
            "rules": [
                {"column": "tokens", "action": "map", "fn": "drop_first_k", "k": 2},
                {"column": "n_tok", "action": "derive", "fn": "recompute_len", "on": "tokens"},
            ]
        }
    )
    t = small()
    before = t["tokens"].combine_chunks().value_lengths().to_pylist()
    out = rs(t)
    after = out["n_tok"].to_pylist()
    assert after == [b - 2 for b in before]
    # wrong order (derive then drop) gives stale lengths — derive-before-destroy
    rs2 = RuleSet.from_config(
        {
            "rules": [
                {"column": "n_tok", "action": "derive", "fn": "recompute_len", "on": "tokens"},
                {"column": "tokens", "action": "map", "fn": "drop_first_k", "k": 2},
            ]
        }
    )
    out2 = rs2(t)
    assert out2["n_tok"].to_pylist() == before


def test_prefix_token():
    t = small()
    rs = RuleSet.from_config(
        {"rules": [{"column": "tokens", "action": "map", "fn": "prefix_token", "token": 1}]}
    )
    out = rs(t)
    got = out["tokens"].to_pylist()
    orig = t["tokens"].to_pylist()
    assert all(g == [1] + o for g, o in zip(got, orig))


def test_truncate_and_sanitize():
    t = pa.table({"path": ["a b/c!", "ok.txt"], "tokens": pa.array([[1, 2, 3], [4]], type=pa.list_(pa.int32()))})
    rs = RuleSet.from_config(
        {
            "rules": [
                {"column": "path", "action": "map", "fn": "sanitize"},
                {"column": "tokens", "action": "map", "fn": "truncate_to_k", "k": 2},
            ]
        }
    )
    out = rs(t)
    assert out["path"].to_pylist() == ["a_b_c_", "ok.txt"]
    assert out["tokens"].to_pylist() == [[1, 2], [4]]


def test_flag_gated_rules():
    # keepDescriptors-style conditional groups
    cfg = {
        "rules": [
            {"column": "source", "action": "null", "unless_flag": "keep_source"},
            {"column": "n_tok", "action": "replace", "value": 0, "flag": "zero_counts"},
        ],
        "flags": {"keep_source": True, "zero_counts": False},
    }
    out = RuleSet.from_config(cfg)(small())
    assert out["source"].null_count == 0  # kept
    assert out["n_tok"].null_count == 0 and set(out["n_tok"].to_pylist()) != {0}
    cfg["flags"] = {"keep_source": False, "zero_counts": True}
    out = RuleSet.from_config(cfg)(small())
    assert out["source"].null_count == 20
    assert set(out["n_tok"].to_pylist()) == {0}


def test_audit_columns():
    rs = RuleSet.from_config({"rules": [], "audit": True})
    out = rs(small())
    assert set(out["identity_removed"].to_pylist()) == {"YES"}
    assert "evolution_method" in out.column_names


def test_struct_recursion():
    # rules recurse into nested structures (ClinicalTrialsAttributes.java:2818-2842)
    t = pa.table(
        {
            "doc_id": ["a", "b"],
            "meta": pa.array(
                [{"author": "alice", "year": 2020}, {"author": "bob", "year": 2021}],
                type=pa.struct([("author", pa.string()), ("year", pa.int32())]),
            ),
        }
    )
    rs = RuleSet.from_config({"rules": [{"column": "meta.author", "action": "replace", "value": "x"}]})
    out = rs(t)
    assert [m["author"] for m in out["meta"].to_pylist()] == ["x", "x"]
    assert [m["year"] for m in out["meta"].to_pylist()] == [2020, 2021]


def test_cast_widen():
    rs = RuleSet.from_config({"rules": [{"column": "n_tok", "action": "cast", "value": "int64"}]})
    out = rs(small())
    assert out.schema.field("n_tok").type == pa.int64()


def test_udf_callable_rule():
    """Expression-language analog: a rule value may be a Python callable
    over the batch (ModifyDICOMTags.java:137-138 / SURVEY §2.9)."""
    import pyarrow.compute as pc

    def double_n_tok(t: pa.Table) -> pa.Array:
        return pc.multiply(t["n_tok"], pa.scalar(2, type=pa.int32()))

    rs = RuleSet.from_config(
        {"rules": [{"column": "n_tok", "action": "map", "fn": double_n_tok}]}
    )
    t = small()
    out = rs(t)
    assert out["n_tok"].to_pylist() == [v * 2 for v in t["n_tok"].to_pylist()]


def test_validate_config():
    rs = RuleSet(rules=[Rule(column="x", action="bogus")])
    assert rs.validate(pa.schema([("x", pa.int32())]))
    rs2 = RuleSet(rules=[Rule(column="x", action="map")])  # map without fn
    assert rs2.validate(pa.schema([]))
    ok = RuleSet.from_config({"rules": [{"column": "source", "action": "remove"}]})
    assert ok.validate(pa.schema([("source", pa.string())])) == []


def test_struct_rule_preserves_null_rows():
    # code-review regression: StructArray.from_arrays drops validity
    t = pa.table(
        {
            "doc_id": ["a", "b"],
            "meta": pa.array(
                [{"author": "alice", "year": 2020}, None],
                type=pa.struct([("author", pa.string()), ("year", pa.int32())]),
            ),
        }
    )
    rs = RuleSet.from_config({"rules": [{"column": "meta.author", "action": "replace", "value": "x"}]})
    out = rs(t)
    vals = out["meta"].to_pylist()
    assert vals[0]["author"] == "x"
    assert vals[1] is None  # null struct row stays null


def test_prefix_token_preserves_null_lists():
    t = pa.table({"tokens": pa.array([[1, 2], None, [3]], type=pa.list_(pa.int32()))})
    rs = RuleSet.from_config(
        {"rules": [{"column": "tokens", "action": "map", "fn": "prefix_token", "token": 9}]}
    )
    out = rs(t)
    got = out["tokens"].to_pylist()
    assert got == [[9, 1, 2], None, [9, 3]]
    # and the result is parquet-writable (zero-length null spans)
    import pyarrow.parquet as pq
    import io

    pq.write_table(out, io.BytesIO())


def test_rules_recurse_into_list_of_struct():
    """A sequence item contains an attribute list which may contain
    further sequences (ClinicalTrialsAttributes.java:2818-2842): rules
    must reach fields inside list<struct> columns."""
    seq_type = pa.list_(pa.struct([("name", pa.string()), ("secret", pa.int64())]))
    t = pa.table(
        {
            "doc_id": ["d1", "d2", "d3"],
            "seq": pa.array(
                [
                    [{"name": "a", "secret": 1}, {"name": "b", "secret": 2}],
                    None,  # null sequence row survives untouched
                    [{"name": "c", "secret": 3}],
                ],
                type=seq_type,
            ),
        }
    )
    rs = RuleSet.from_config(
        {"rules": [{"column": "seq.secret", "action": "null"},
                   {"column": "seq.name", "action": "replace", "value": "X"}]}
    )
    out = rs(t)
    vals = out["seq"].to_pylist()
    assert vals[1] is None
    assert all(item["secret"] is None and item["name"] == "X"
               for row in (vals[0], vals[2]) for item in row)
    # parquet round-trip accepts the rebuilt offsets (null rows zero-span)
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(out, buf)


def test_rules_recurse_depth_two_and_remove_field():
    meta_type = pa.struct(
        [("info", pa.struct([("owner", pa.string()), ("keep", pa.int64())])),
         ("other", pa.string())]
    )
    t = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "meta": pa.array(
                [{"info": {"owner": "alice", "keep": 1}, "other": "x"},
                 {"info": {"owner": "bob", "keep": 2}, "other": "y"}],
                type=meta_type,
            ),
        }
    )
    rs = RuleSet.from_config(
        {"rules": [{"column": "meta.info.owner", "action": "replace", "value": "anon"},
                   {"column": "meta.info.keep", "action": "remove"},
                   {"column": "meta.absent.deeper", "action": "null"}]}  # no-op
    )
    out = rs(t)
    vals = out["meta"].to_pylist()
    assert [v["info"]["owner"] for v in vals] == ["anon", "anon"]
    assert all("keep" not in v["info"] for v in vals)
    assert [v["other"] for v in vals] == ["x", "y"]


def test_rules_recurse_list_of_struct_containing_list():
    """Depth: list<struct< tags: list<struct<k,v>> >> — two list levels."""
    inner = pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())]))
    outer = pa.list_(pa.struct([("id", pa.int64()), ("tags", inner)]))
    t = pa.table(
        {
            "doc_id": ["d1"],
            "seq": pa.array(
                [[{"id": 1, "tags": [{"k": "a", "v": 10}, {"k": "b", "v": 20}]},
                  {"id": 2, "tags": None}]],
                type=outer,
            ),
        }
    )
    rs = RuleSet.from_config({"rules": [{"column": "seq.tags.v", "action": "null"}]})
    out = rs(t)
    row = out["seq"].to_pylist()[0]
    assert all(tag["v"] is None for tag in row[0]["tags"])
    assert row[1]["tags"] is None
