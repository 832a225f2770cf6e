"""String column support: dictionary encoding, literal predicates,
GROUP BY / ORDER BY / DISTINCT on strings, string-key joins.

Exceeds the reference, which declares DataType::String but leaves string
columns off-device (device_ptr = nullptr, csv_loader.cpp:151-155) so no
query can touch them.
"""

import numpy as np
import pytest

from warpdb_tpu import DataType, WarpDB
from warpdb_tpu.errors import TokenizeError, ValidationError, WarpDBError
from warpdb_tpu.storage import HostTable


@pytest.fixture(scope="module")
def sdb(tmp_path_factory):
    p = tmp_path_factory.mktemp("strs") / "sales.csv"
    p.write_text(
        "price,quantity,category\n"
        "10.5,3,toys\n"
        "20.0,4,books\n"
        "15.25,2,toys\n"
        "30.0,5,games\n"
        "8.0,1,books\n"
    )
    schema = [DataType.FLOAT32, DataType.FLOAT32, DataType.STRING]
    return WarpDB(str(p), schema)


def test_dictionary_encoding(sdb):
    assert "category" in sdb.table.dicts
    assert sdb.table.dicts["category"].tolist() == ["books", "games", "toys"]
    # Codes live on device like any numeric column.
    assert "category" in sdb.table.columns


def test_string_equality_filter(sdb):
    got = sdb.query("price WHERE category == 'toys'")
    assert got == pytest.approx([10.5, 0.0, 15.25, 0.0, 0.0])
    got = sdb.query_sql("SELECT price FROM sales WHERE category == 'books'")
    assert got == pytest.approx([20.0, 8.0])
    got = sdb.query_sql("SELECT price FROM sales WHERE category != 'toys'")
    assert got == pytest.approx([20.0, 30.0, 8.0])


def test_string_inequality_lexicographic(sdb):
    # 'books' < 'games' < 'toys'; literal absent from the vocabulary still
    # ranks correctly ('cars' sits between books and games).
    got = sdb.query_sql("SELECT price FROM sales WHERE category < 'games'")
    assert got == pytest.approx([20.0, 8.0])
    got = sdb.query_sql("SELECT price FROM sales WHERE category > 'cars'")
    assert got == pytest.approx([10.5, 15.25, 30.0])
    # Equality against an unknown string matches nothing.
    assert sdb.query_sql("SELECT price FROM sales WHERE category == 'cars'") == []


def test_select_string_column_decodes(sdb):
    got = sdb.query_sql("SELECT category FROM sales WHERE price > 12")
    assert got == ["books", "toys", "games"]


def test_group_by_string(sdb):
    out = sdb.query_sql_table(
        "SELECT category AS cat, SUM(price) AS total, COUNT(*) AS n "
        "FROM sales GROUP BY category ORDER BY category ASC"
    )
    assert out["cat"] == ["books", "games", "toys"]
    assert out["total"] == pytest.approx([28.0, 30.0, 25.75])
    assert out["n"] == pytest.approx([2.0, 1.0, 2.0])


def test_distinct_string(sdb):
    got = sdb.query_sql("SELECT DISTINCT category FROM sales")
    assert got == ["books", "games", "toys"]


def test_distinct_multi_column_string(sdb):
    # Multi-column DISTINCT with a string key: GROUP BY rewrite carries
    # the code column; decode happens at the API boundary.
    res = sdb.query_sql_table(
        "SELECT DISTINCT category, quantity FROM sales"
    )
    got = sorted(zip(list(res.values())[0], list(res.values())[1]))
    assert got == [
        ("books", 1.0),
        ("books", 4.0),
        ("games", 5.0),
        ("toys", 2.0),
        ("toys", 3.0),
    ]


def test_order_by_string(sdb):
    got = sdb.query_sql(
        "SELECT price FROM sales ORDER BY category ASC LIMIT 2"
    )
    # books rows first (stable within equal keys): 20.0, 8.0
    assert got == pytest.approx([20.0, 8.0])


def test_string_join_key():
    left = WarpDB(
        HostTable.from_dict(
            {
                "price": np.array([1.0, 2.0, 3.0], np.float32),
                "cat": np.array(["a", "b", "c"], object),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    right = HostTable.from_dict(
        # Different vocabulary (extra 'z', missing 'c') — codes must be
        # translated, not compared raw.
        {
            "rate": np.array([10.0, 20.0, 30.0], np.float32),
            "cat": np.array(["b", "z", "a"], object),
        },
        dtypes={"cat": DataType.STRING},
    )
    left.register_table("rates", right)
    out = left.query_sql_table(
        "SELECT price, rates.rate FROM t JOIN rates ON cat = rates.cat"
    )
    pairs = sorted(zip(out["price"], out["rates.rate"]))
    assert pairs == [(1.0, 30.0), (2.0, 10.0)]


def test_string_window_partition(sdb):
    got = sdb.query_sql(
        "SELECT SUM(price) OVER (PARTITION BY category) FROM sales"
    )
    assert got == pytest.approx([25.75, 28.0, 25.75, 30.0, 28.0])


def test_string_errors(sdb):
    with pytest.raises(ValidationError, match="non-string"):
        sdb.query_sql("SELECT price FROM sales WHERE price == 'toys'")
    with pytest.raises(ValidationError, match="comparison"):
        sdb.query_sql("SELECT price FROM sales WHERE category + 'x' > 1")
    from warpdb_tpu.errors import ParseError

    with pytest.raises(ParseError, match="Unterminated string"):
        sdb.query_sql("SELECT price FROM sales WHERE category == 'oops")
    with pytest.raises(TokenizeError, match="Unterminated string"):
        from warpdb_tpu.frontend import tokenize

        tokenize("category == 'oops")


def test_quote_styles(sdb):
    a = sdb.query_sql("SELECT price FROM sales WHERE category == 'toys'")
    b = sdb.query_sql('SELECT price FROM sales WHERE category == "toys"')
    assert a == b


# --- review regressions: string column vs column, grouped table binding ----


def test_string_column_vs_column_same_table():
    # Shared per-table vocabulary: codes are comparable across columns.
    db = WarpDB(
        HostTable.from_dict(
            {
                "a": np.array(["x", "y", "z"], object),
                "b": np.array(["x", "q", "z"], object),
                "v": np.array([1.0, 2.0, 3.0], np.float32),
            },
            dtypes={"a": DataType.STRING, "b": DataType.STRING},
        )
    )
    got = db.query_sql("SELECT v FROM t WHERE a == b")
    assert got == [1.0, 3.0]
    got = db.query_sql("SELECT v FROM t WHERE a != b")
    assert got == [2.0]


def test_string_cross_table_compare_rejected():
    left = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(["a", "b"], object),
                "v": np.array([1.0, 2.0], np.float32),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    right = HostTable.from_dict(
        {
            "cat": np.array(["b", "z"], object),
            "w": np.array([10.0, 20.0], np.float32),
        },
        dtypes={"cat": DataType.STRING},
    )
    left.register_table("r", right)
    # As a JOIN condition the dictionaries are translated — fine.
    out = left.query_sql_table("SELECT v, r.w FROM t JOIN r ON cat = r.cat")
    assert out["v"] == [2.0] and out["r.w"] == [10.0]
    # As a WHERE filter over the joined namespace they are not comparable.
    with pytest.raises(ValidationError, match="different"):
        left.query_sql("SELECT v FROM t JOIN r ON v = r.w WHERE cat == r.cat")


def test_grouped_table_with_string_literal(sdb):
    out = sdb.query_sql_table(
        "SELECT quantity, SUM(price) AS s FROM sales "
        "WHERE category == 'toys' GROUP BY quantity ORDER BY quantity ASC"
    )
    assert out["quantity"] == [2.0, 3.0]
    assert out["s"] == pytest.approx([15.25, 10.5])


def test_select_star_decodes_strings(sdb):
    # SELECT * whose first expanded column is numeric, string col decoded
    # in the table API.
    out = sdb.query_sql_table("SELECT * FROM sales WHERE price > 25")
    assert out["category"] == ["games"]
    # query_sql returns the first expanded column decoded if string.
    db2 = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(["b", "a"], object),
                "v": np.array([1.0, 2.0], np.float32),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    assert db2.query_sql("SELECT * FROM t") == ["b", "a"]


def test_empty_string_column_exports_utf8():
    import pyarrow as pa

    db = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(["b", "a"], object),
                "v": np.array([1.0, 2.0], np.float32),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    rb = db.query_record_batch("SELECT cat, v FROM t WHERE v > 100")
    assert rb.num_rows == 0
    assert pa.types.is_string(rb.schema.field("cat").type)


# --- IN / BETWEEN / NOT / LIKE (extensions) --------------------------------


def test_in_between_not_predicates():
    db = WarpDB(
        HostTable.from_dict({"v": np.arange(1, 7, dtype=np.float32)})
    )
    assert db.query_sql("SELECT v FROM t WHERE v IN (2, 4, 9)") == [2.0, 4.0]
    assert db.query_sql("SELECT v FROM t WHERE v BETWEEN 3 AND 5") == [
        3.0, 4.0, 5.0,
    ]
    assert db.query_sql("SELECT v FROM t WHERE NOT v > 4") == [
        1.0, 2.0, 3.0, 4.0,
    ]
    assert db.query_sql(
        "SELECT v FROM t WHERE NOT v BETWEEN 2 AND 5"
    ) == [1.0, 6.0]
    assert db.query_sql(
        "SELECT v FROM t WHERE v IN (1, 2) OR v BETWEEN 5 AND 6"
    ) == [1.0, 2.0, 5.0, 6.0]


def test_like_and_string_in():
    db = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(
                    ["toys", "books", "tools", "games", "totes"], object
                ),
                "v": np.array([1, 2, 3, 4, 5], np.float32),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE 'to%'") == [
        1.0, 3.0, 5.0,
    ]
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE '%oo%'") == [
        2.0, 3.0,
    ]
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE 't_ys'") == [1.0]
    assert db.query_sql("SELECT v FROM t WHERE NOT cat LIKE 'to%'") == [
        2.0, 4.0,
    ]
    assert db.query_sql(
        "SELECT v FROM t WHERE cat IN ('books', 'games')"
    ) == [2.0, 4.0]
    # LIKE on a numeric column is a validation error.
    with pytest.raises(ValidationError, match="LIKE requires a string"):
        db.query_sql("SELECT v FROM t WHERE v LIKE 'x%'")


def test_min_max_string_decoded(sdb):
    out = sdb.query_sql_table(
        "SELECT quantity, MIN(category) AS lo, MAX(category) AS hi "
        "FROM sales GROUP BY quantity ORDER BY quantity ASC"
    )
    # each quantity appears once: lo == hi == that row's category
    assert out["lo"] == ["books", "toys", "toys", "books", "games"]
    assert out["hi"] == out["lo"]
    assert sdb.query_sql("SELECT MIN(category) FROM sales") == ["books"]


def test_like_metacharacters_literal():
    db = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(["a[b]", "ab", "2*3", "2xx3", "a?"], object),
                "v": np.array([1, 2, 3, 4, 5], np.float32),
            },
            dtypes={"cat": DataType.STRING},
        )
    )
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE 'a[b]'") == [1.0]
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE '2*3'") == [3.0]
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE 'a?'") == [5.0]
    assert db.query_sql("SELECT v FROM t WHERE cat LIKE '2%3'") == [3.0, 4.0]


def test_negated_predicates():
    db = WarpDB(HostTable.from_dict({"v": np.arange(1, 6, dtype=np.float32)}))
    assert db.query_sql("SELECT v FROM t WHERE v NOT IN (1, 3)") == [
        2.0, 4.0, 5.0,
    ]
    assert db.query_sql("SELECT v FROM t WHERE v NOT BETWEEN 2 AND 4") == [
        1.0, 5.0,
    ]


def test_count_distinct_window_rejected():
    from warpdb_tpu.errors import ParseError

    db = WarpDB(HostTable.from_dict({"v": np.float32([1, 2])}))
    with pytest.raises(ParseError, match="window"):
        db.query_sql("SELECT COUNT(DISTINCT v) OVER (PARTITION BY v) FROM t")


def test_count_distinct_large_int_keys():
    ids = np.array([16777216, 16777216, 16777217, 16777217], np.int32)
    db = WarpDB(
        HostTable.from_dict({"id": ids, "v": np.float32([1, 2, 3, 4])})
    )
    out = db.query_sql_table(
        "SELECT COUNT(DISTINCT v) AS d, COUNT(*) AS n FROM t GROUP BY id"
    )
    assert out["d"] == [2.0, 2.0] and out["n"] == [2.0, 2.0]


def test_min_string_empty_result_stays_float(sdb):
    out = sdb.query_sql("SELECT MIN(category) FROM sales WHERE price > 99999")
    assert out == [float("inf")]


def test_streaming_expression_rejects_strings(tmp_path):
    from warpdb_tpu.errors import WarpDBError

    path = tmp_path / "s.ndjson"
    path.write_text('{"cat": "zebra", "v": 1.0}\n{"cat": "apple", "v": 2.0}\n')
    with pytest.raises(WarpDBError, match="string columns"):
        WarpDB.query_streaming_csv(str(path), "cat", rows_per_chunk=1)


# --- string scalar functions (vocabulary-transform CodeMaps) ----------------


@pytest.fixture(scope="module")
def fdb():
    db = WarpDB(HostTable.from_dict(
        {
            "name": np.array(["Apple", "banana", "Cherry", "apple "], object),
            "x": np.array([1.0, 2.0, 3.0, 4.0], np.float32),
        },
        dtypes={"name": DataType.STRING, "x": DataType.FLOAT32},
    ))
    return db


def test_string_funcs_select(fdb):
    assert fdb.query_sql("SELECT UPPER(name) FROM t") == [
        "APPLE", "BANANA", "CHERRY", "APPLE ",
    ]
    assert fdb.query_sql("SELECT LOWER(name) FROM t") == [
        "apple", "banana", "cherry", "apple ",
    ]
    assert fdb.query_sql("SELECT LENGTH(name) FROM t") == [5.0, 6.0, 6.0, 6.0]
    assert fdb.query_sql("SELECT TRIM(name) FROM t") == [
        "Apple", "banana", "Cherry", "apple",
    ]
    assert fdb.query_sql("SELECT SUBSTR(name, 1, 3) FROM t") == [
        "App", "ban", "Che", "app",
    ]
    assert fdb.query_sql("SELECT REPLACE(name, 'a', '_') FROM t") == [
        "Apple", "b_n_n_", "Cherry", "_pple ",
    ]
    assert fdb.query_sql("SELECT CONCAT(name, '!') FROM t") == [
        "Apple!", "banana!", "Cherry!", "apple !",
    ]
    assert fdb.query_sql("SELECT REVERSE(name) FROM t") == [
        "elppA", "ananab", "yrrehC", " elppa",
    ]
    # Nested functions compose inside-out.
    assert fdb.query_sql("SELECT SUBSTR(UPPER(name), 2, 2) FROM t") == [
        "PP", "AN", "HE", "PP",
    ]


def test_string_funcs_predicates(fdb):
    assert fdb.query_sql(
        "SELECT x FROM t WHERE UPPER(name) = 'APPLE'"
    ) == [1.0]
    assert fdb.query_sql(
        "SELECT x FROM t WHERE LOWER(TRIM(name)) = 'apple'"
    ) == [1.0, 4.0]
    assert fdb.query_sql(
        "SELECT x FROM t WHERE UPPER(name) LIKE 'A%'"
    ) == [1.0, 4.0]
    assert fdb.query_sql(
        "SELECT x FROM t WHERE LOWER(name) IN ('apple', 'cherry')"
    ) == [1.0, 3.0]
    assert fdb.query_sql(
        "SELECT x FROM t WHERE LENGTH(name) > 5"
    ) == [2.0, 3.0, 4.0]
    assert fdb.query_sql(
        "SELECT x FROM t WHERE CONCAT(name, '!') = 'banana!'"
    ) == [2.0]


def test_string_funcs_relational(fdb):
    # Transformed codes stay order-correct (fresh sorted vocabulary).
    assert fdb.query_sql(
        "SELECT UPPER(name) FROM t ORDER BY UPPER(name) ASC"
    ) == ["APPLE", "APPLE ", "BANANA", "CHERRY"]
    assert fdb.query_sql("SELECT MIN(UPPER(name)) FROM t") == ["APPLE"]
    assert fdb.query_sql(
        "SELECT DISTINCT LOWER(TRIM(name)) FROM t"
    ) == ["apple", "banana", "cherry"]
    out = fdb.query_sql_table(
        "SELECT LOWER(TRIM(name)) AS n, COUNT(*) AS c FROM t "
        "GROUP BY LOWER(TRIM(name)) ORDER BY LOWER(TRIM(name)) ASC"
    )
    assert out["n"] == ["apple", "banana", "cherry"]
    assert out["c"] == [2.0, 1.0, 1.0]


def test_string_funcs_outer_join_miss(fdb):
    fdb.register_table("r", HostTable.from_dict(
        {
            "name": np.array(["Apple", "zzz"], object),
            "w": np.array([10.0, 20.0], np.float32),
        },
        dtypes={"name": DataType.STRING, "w": DataType.FLOAT32},
    ))
    out = fdb.query_sql_table(
        "SELECT t.name, UPPER(r.name) FROM t LEFT JOIN r "
        "ON name = r.name ORDER BY x ASC"
    )
    assert out["UPPER(r.name[idx])"] == ["APPLE", "", "", ""]


def test_string_funcs_errors(fdb):
    from warpdb_tpu.errors import UnsupportedError

    with pytest.raises(UnsupportedError, match="two string columns"):
        fdb.query_sql("SELECT CONCAT(name, name) FROM t")
    with pytest.raises(ValidationError, match="literal"):
        fdb.query_sql("SELECT SUBSTR(name, x, 2) FROM t")


def test_date_part_extraction():
    """YEAR/MONTH/DAY/HOUR/MINUTE/SECOND over ISO-8601 strings (and the
    standard EXTRACT(part FROM e) spelling) — vocabulary transforms, so
    they group, filter, and order like any numeric expression."""
    db = WarpDB(
        HostTable.from_dict(
            {
                "ts": np.array(
                    [
                        "2024-01-15 10:30:45",
                        "2024-02-20 23:59:59",
                        "2023-12-31",
                        "2024-01-05",
                        "not-a-date",
                    ],
                    dtype=object,
                ),
                "v": np.array([1, 2, 3, 4, 5], np.float32),
            }
        )
    )
    out = db.query_sql_table(
        "SELECT YEAR(ts), MONTH(ts), SUM(v) FROM t "
        "GROUP BY YEAR(ts), MONTH(ts) ORDER BY YEAR(ts), MONTH(ts)"
    )
    rows = list(zip(*out.values()))
    # NaN keys (malformed date) sort last per the engine's total order.
    assert rows[:3] == [
        (2023.0, 12.0, 3.0),
        (2024.0, 1.0, 5.0),
        (2024.0, 2.0, 2.0),
    ]
    import math

    assert math.isnan(rows[3][0])  # the malformed-date group
    assert db.query_sql(
        "SELECT v FROM t WHERE EXTRACT(MONTH FROM ts) == 1"
    ) == [1.0, 4.0]
    out = db.query_sql_table(
        "SELECT HOUR(ts), MINUTE(ts), SECOND(ts) FROM t WHERE v == 1"
    )
    assert list(zip(*out.values())) == [(10.0, 30.0, 45.0)]
    # Time parts of a date-only entry are NULL (NaN).
    out = db.query_sql_table("SELECT HOUR(ts) FROM t WHERE v == 3")
    assert math.isnan(list(out.values())[0][0])


def test_extract_rejects_unknown_part():
    from warpdb_tpu.errors import ParseError

    db = WarpDB("data/test.csv")
    with pytest.raises(ParseError):
        db.query_sql("SELECT EXTRACT(EPOCH FROM price) FROM test")


def test_string_agg_grouped():
    """STRING_AGG(expr, sep) / GROUP_CONCAT: grouped string
    concatenation in ascending value order (deterministic)."""
    db = WarpDB(
        HostTable.from_dict(
            {
                "cat": np.array(["a", "b", "a", "b", "a"], dtype=object),
                "name": np.array(
                    ["zeta", "bee", "ant", "cow", "mid"], dtype=object
                ),
                "v": np.array([1, 2, 3, 4, 5], np.float32),
            }
        )
    )
    out = db.query_sql_table(
        "SELECT cat, STRING_AGG(name, ', ') FROM t GROUP BY cat "
        "ORDER BY cat"
    )
    assert list(zip(*out.values())) == [
        ("a", "ant, mid, zeta"),
        ("b", "bee, cow"),
    ]
    # MySQL synonym with its default ',' separator; numeric values
    # format with %g.
    out = db.query_sql_table(
        "SELECT cat, GROUP_CONCAT(v) FROM t GROUP BY cat ORDER BY cat"
    )
    assert list(zip(*out.values())) == [("a", "1,3,5"), ("b", "2,4")]
    # WHERE applies before collection.
    out = db.query_sql_table(
        "SELECT cat, STRING_AGG(name, '|') FROM t WHERE v > 2 "
        "GROUP BY cat ORDER BY cat"
    )
    assert list(zip(*out.values())) == [("a", "ant|mid"), ("b", "cow")]


def test_string_agg_global_and_mixed():
    db = WarpDB(
        HostTable.from_dict(
            {
                "name": np.array(["zeta", "bee", "ant"], dtype=object),
                "v": np.array([1, 2, 3], np.float32),
            }
        )
    )
    out = db.query_sql_table("SELECT STRING_AGG(name, '|'), SUM(v) FROM t")
    assert list(zip(*out.values())) == [("ant|bee|zeta", 6.0)]


def test_string_agg_rejections(tmp_path):
    from warpdb_tpu.errors import ParseError, UnsupportedError

    db = WarpDB("data/test.csv")
    with pytest.raises(ParseError):
        db.query_sql("SELECT STRING_AGG(price) FROM test")  # no separator
    with pytest.raises(ParseError):
        db.query_sql(
            "SELECT STRING_AGG(price, ',') FILTER (WHERE price > 1) "
            "FROM test"
        )
    p = tmp_path / "sa.csv"
    p.write_text("cat,v\na,1\nb,2\n")
    with pytest.raises(UnsupportedError):
        WarpDB.query_streaming_sql(
            str(p), "SELECT STRING_AGG(cat, ',') FROM sa", rows_per_chunk=1
        )


def test_date_trunc():
    """DATE_TRUNC('part', d): truncated ISO strings group and sort
    chronologically through the ordinary string machinery; malformed
    entries map to the empty string (r3)."""
    d = np.array(["2024-01-15", "2024-02-03", "2024-02-20", "2023-11-30",
                  "bogus", "2024-07-09 13:45:10"])
    v = np.arange(1, 7, dtype=np.float32)
    db = WarpDB(HostTable.from_dict({"d": d, "v": v}))
    out = db.query_sql_table(
        "SELECT DATE_TRUNC('month', d) AS m, SUM(v) FROM t "
        "GROUP BY DATE_TRUNC('month', d) ORDER BY m ASC")
    assert out["m"] == ["", "2023-11-01", "2024-01-01", "2024-02-01",
                        "2024-07-01"]
    np.testing.assert_allclose(out["SUM(v[idx])"], [5.0, 4.0, 1.0, 5.0, 6.0])
    out = db.query_sql_table("SELECT DATE_TRUNC('quarter', d) FROM t LIMIT 1")
    assert list(out.values())[0] == ["2024-01-01"]
    out = db.query_sql_table(
        "SELECT DATE_TRUNC('hour', d) FROM t WHERE MONTH(d) = 7")
    assert list(out.values())[0] == ["2024-07-09 13:00:00"]
    with pytest.raises(WarpDBError, match="DATE_TRUNC supports"):
        db.query_sql("SELECT DATE_TRUNC('fortnight', d) FROM t")


def test_ilike():
    """ILIKE (case-insensitive LIKE, PostgreSQL extension) — contextual
    keyword, NOT ILIKE spelling, plan-time code binding like LIKE."""
    n = np.array(["Apple", "apple pie", "Banana", "CHERRY", "cherry"])
    db = WarpDB(HostTable.from_dict(
        {"n": n, "x": np.arange(5, dtype=np.float32)}))
    assert db.query_sql_table("SELECT n FROM t WHERE n ILIKE 'apple%'")[
        "n"] == ["Apple", "apple pie"]
    assert db.query_sql_table("SELECT n FROM t WHERE n NOT ILIKE '%e%'")[
        "n"] == ["Banana"]
    assert db.query_sql("SELECT COUNT(*) FROM t WHERE n ILIKE 'CHERRY'") \
        == [2.0]
    # A column actually named "ilike" still parses as an identifier.
    db2 = WarpDB(HostTable.from_dict(
        {"ilike": np.arange(4, dtype=np.float32)}))
    assert db2.query_sql("SELECT ilike FROM t WHERE ilike > 2") == [3.0]


def test_regexp_predicates():
    """REGEXP / RLIKE operators and STARTS_WITH / ENDS_WITH / CONTAINS /
    REGEXP_MATCHES functions — all lower to the same vocabulary-LUT
    code-set machinery as LIKE."""
    names = np.array(
        ["alpha", "beta", "Gamma", "delta42", "epsilon", "a42z"],
        dtype=object,
    )
    v = np.arange(6, dtype=np.float32)
    db = WarpDB(HostTable.from_dict({"s": names, "v": v}))

    assert db.query_sql_table(
        "SELECT v FROM t WHERE s REGEXP '[0-9]+'"
    )["v"] == [3.0, 5.0]
    assert db.query_sql_table(
        "SELECT v FROM t WHERE s RLIKE '^[ab]'"
    )["v"] == [0.0, 1.0, 5.0]
    assert db.query_sql_table(
        "SELECT v FROM t WHERE s NOT REGEXP '[0-9]'"
    )["v"] == [0.0, 1.0, 2.0, 4.0]
    assert db.query_sql_table(
        "SELECT v FROM t WHERE STARTS_WITH(s, 'a')"
    )["v"] == [0.0, 5.0]
    assert db.query_sql_table(
        "SELECT v FROM t WHERE ENDS_WITH(s, 'a')"
    )["v"] == [0.0, 1.0, 2.0]
    assert db.query_sql_table(
        "SELECT v FROM t WHERE CONTAINS(s, 'lt')"
    )["v"] == [3.0]
    # As a 0/1 value in the select list.
    assert db.query_sql_table(
        "SELECT REGEXP_MATCHES(s, '42') AS m FROM t"
    )["m"] == [0.0, 0.0, 0.0, 1.0, 0.0, 1.0]
    # Invalid patterns fail at plan time with a clear error.
    import pytest as _pytest
    from warpdb_tpu.errors import ValidationError as _VE

    with _pytest.raises(_VE):
        db.query_sql("SELECT v FROM t WHERE s REGEXP '[unclosed'")
    # A column actually named "regexp" still parses as an identifier.
    db2 = WarpDB(
        HostTable.from_dict({"regexp": np.arange(4, dtype=np.float32)})
    )
    assert db2.query_sql("SELECT regexp FROM t WHERE regexp > 2") == [3.0]


def test_string_pad_split_search_functions():
    """LPAD/RPAD/SPLIT_PART/REPEAT/INITCAP/STRPOS/INSTR — PostgreSQL
    semantics, lowered through the same O(vocab) CodeMap transform as
    the rest of the string functions."""
    names = np.array(
        ["a-b-c", "hello world", "x", "longword"], dtype=object
    )
    db = WarpDB(
        HostTable.from_dict(
            {"s": names, "v": np.arange(4, dtype=np.float32)}
        )
    )
    out = db.query_sql_table(
        "SELECT LPAD(s, 5, '*') AS l, RPAD(s, 5, '*') AS r, "
        "SPLIT_PART(s, '-', 2) AS p, REPEAT(s, 2) AS rr, "
        "INITCAP(s) AS ic, STRPOS(s, 'o') AS sp FROM t ORDER BY v ASC"
    )
    assert out["l"] == ["a-b-c", "hello", "****x", "longw"]
    assert out["r"] == ["a-b-c", "hello", "x****", "longw"]
    assert out["p"] == ["b", "", "", ""]
    assert out["rr"] == ["a-b-ca-b-c", "hello worldhello world",
                         "xx", "longwordlongword"]
    assert out["ic"] == ["A-B-C", "Hello World", "X", "Longword"]
    assert out["sp"] == [0.0, 5.0, 0.0, 2.0]
    # Compose with predicates and GROUP BY.
    assert db.query_sql_table(
        "SELECT v FROM t WHERE STRPOS(s, 'world') > 0"
    )["v"] == [1.0]
    # PostgreSQL edges: empty fill pads nothing (after truncation);
    # INITCAP treats digits as word characters ('abc2def' stays
    # 'Abc2def', unlike str.title()).
    db2 = WarpDB(
        HostTable.from_dict(
            {"s": np.array(["abc2def", "hi"], dtype=object),
             "v": np.arange(2, dtype=np.float32)}
        )
    )
    out2 = db2.query_sql_table(
        "SELECT INITCAP(s) AS ic, LPAD(s, 5, '') AS lp FROM t "
        "ORDER BY v ASC"
    )
    assert out2["ic"] == ["Abc2def", "Hi"]
    assert out2["lp"] == ["abc2d", "hi"]
