"""Transform-surface tests: fixed operator ordering semantics
(transform.rs:9-22), typed literal coercion, merge schema check."""

import pyspark.sql.functions as F
import pytest

from tbl_spark.transforms import TransformSpec, apply_transforms, merge


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_filter_select_sort_head(lineitem):
    out = apply_transforms(lineitem, TransformSpec(
        filters=["l_quantity>=30", "l_returnflag=A"],
        select=["l_orderkey", "l_quantity", "l_returnflag"],
        sort=["l_quantity:desc", "l_orderkey"],
        head=10))
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.l_quantity >= 30 and r.l_returnflag == "A" for r in rows)
    qs = [r.l_quantity for r in rows]
    assert qs == sorted(qs, reverse=True)
    assert out.columns == ["l_orderkey", "l_quantity", "l_returnflag"]


def test_filters_see_pre_rename_names(lineitem):
    """rename is applied LAST: filters use old names even when rename maps
    them away (transform.rs ordering consequence)."""
    out = apply_transforms(lineitem, TransformSpec(
        filters=["l_quantity>45"],
        select=["l_orderkey", "l_quantity"],
        rename=["l_quantity=qty"]))
    assert out.columns == ["l_orderkey", "qty"]
    assert out.filter(F.col("qty") <= 45).count() == 0


def test_value_counts_replaces_relation(lineitem):
    out = apply_transforms(lineitem, TransformSpec(
        value_counts="l_returnflag"))
    assert out.columns == ["l_returnflag", "count"]
    rows = out.collect()
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == lineitem.count()


def test_with_columns_set_nullify_replace(lineitem):
    out = apply_transforms(lineitem.limit(100), TransformSpec(
        with_columns=["flag:i32=7", "empty:str"],
        set=["l_tax=0.5"],
        nullify=["l_discount"],
        replace=["l_returnflag.A=X"]))
    rows = out.collect()
    assert all(r.flag == 7 and r.empty is None for r in rows)
    assert all(r.l_tax == 0.5 for r in rows)
    assert all(r.l_discount is None for r in rows)
    assert not any(r.l_returnflag == "A" for r in rows)
    assert dict(out.dtypes)["flag"] == "int"


def test_offset_head_tail_slicing(orders):
    base = apply_transforms(orders, TransformSpec(sort=["o_orderkey"]))
    first = apply_transforms(base, TransformSpec(head=10)).collect()
    shifted = apply_transforms(base, TransformSpec(offset=5, head=5)).collect()
    assert [r.o_orderkey for r in shifted] == \
        [r.o_orderkey for r in first[5:]]


def test_cast_and_unsigned_widening(lineitem):
    out = apply_transforms(lineitem.limit(10), TransformSpec(
        cast=["l_linenumber=u64", "l_quantity=i32"]))
    types = dict(out.dtypes)
    assert types["l_linenumber"] == "decimal(20,0)"
    assert types["l_quantity"] == "int"


def test_null_predicate_filters(lineitem):
    out = apply_transforms(lineitem.limit(50), TransformSpec(
        nullify=["l_comment"] if "l_comment" in lineitem.columns else []))
    assert apply_transforms(
        lineitem, TransformSpec(filters=["l_orderkey.is_not_null"])
    ).count() == lineitem.count()
    assert apply_transforms(
        lineitem, TransformSpec(filters=["l_orderkey.is_null"])).count() == 0
    _ = out


def test_merge_schema_check(lineitem, orders):
    assert merge([lineitem, lineitem]).count() == 2 * lineitem.count()
    with pytest.raises(ValueError, match="schema mismatch"):
        merge([lineitem, orders])


def test_hex_int_literal(lineitem):
    # int parse incl. hex radix (transform.rs:267-275)
    a = apply_transforms(lineitem, TransformSpec(filters=["l_orderkey<0x10"]))
    b = lineitem.filter(F.col("l_orderkey") < 16)
    assert a.count() == b.count()
