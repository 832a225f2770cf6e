"""Frontend tests: tokenizer, expression parser, SQL parser, validation.

Ports the reference's tier-1 host tests (SURVEY.md §4.1):
tokenizer_tests.cpp, test_expression.cpp, precedence_tests.cpp,
expression_tests.cpp, parsing_error_tests.cpp, tokenize_error_test.cpp,
parse_query_error_test.cpp, query_parser_test.cpp,
identifier_validation_test.cpp.  The golden ``canonical()`` strings are
the reference's golden ``to_cuda_expr()`` strings — the de-facto spec.
"""

import pytest

from warpdb_tpu.errors import ParseError, TokenizeError, ValidationError
from warpdb_tpu.frontend import (
    Aggregation,
    AggregationType,
    TokenType,
    WindowFunction,
    parse_expression,
    parse_query,
    tokenize,
    validate_expression,
    validate_query,
)


# --- tokenizer_tests.cpp ---------------------------------------------------


def test_basic_tokenize():
    tokens = tokenize("price > 10")
    assert len(tokens) == 4
    assert tokens[0].type is TokenType.IDENTIFIER and tokens[0].value == "price"
    assert tokens[1].type is TokenType.OPERATOR and tokens[1].value == ">"
    assert tokens[2].type is TokenType.NUMBER and tokens[2].value == "10"
    assert tokens[3].type is TokenType.END


def test_parentheses_tokenize():
    tokens = tokenize("(price + 5) * quantity")
    expected = [
        TokenType.OPERATOR, TokenType.IDENTIFIER, TokenType.OPERATOR,
        TokenType.NUMBER, TokenType.OPERATOR, TokenType.OPERATOR,
        TokenType.IDENTIFIER, TokenType.END,
    ]
    assert [t.type for t in tokens] == expected


def test_logical_keywords():
    tokens = tokenize("price > 10 AND quantity < 5")
    kws = [t.value for t in tokens if t.type is TokenType.KEYWORD]
    assert "AND" in kws and "OR" not in kws


def test_sql_inequality_normalises_to_bang_eq():
    # <> (standard SQL) lexes as the same operator token as != so every
    # downstream canonical form / cache key sees one spelling.
    ops = [t.value for t in tokenize("a <> 4") if t.type is TokenType.OPERATOR]
    assert ops == ["!="]
    a = parse_expression(tokenize("a <> 4"))
    b = parse_expression(tokenize("a != 4"))
    assert a.canonical() == b.canonical()


def test_two_char_operators_before_single():
    tokens = tokenize("a >= 1 <= 2 == 3 != 4")
    ops = [t.value for t in tokens if t.type is TokenType.OPERATOR]
    assert ops == [">=", "<=", "==", "!="]


def test_qualified_identifier():
    tokens = tokenize("sales.id")
    assert tokens[0].type is TokenType.IDENTIFIER
    assert tokens[0].value == "sales.id"


def test_keyword_case_insensitive():
    tokens = tokenize("select Price from t")
    assert tokens[0].type is TokenType.KEYWORD and tokens[0].value == "SELECT"
    assert tokens[1].type is TokenType.IDENTIFIER and tokens[1].value == "Price"


# --- test_expression.cpp golden strings ------------------------------------


@pytest.mark.parametrize(
    "text,golden",
    [
        ("price > 10", "(price[idx] > 10.0f)"),
        ("quantity <= 5", "(quantity[idx] <= 5.0f)"),
        ("discount(price, 0.9)", "discount(price[idx], 0.9f)"),
        (
            "price > 10 AND quantity < 5",
            "((price[idx] > 10.0f) && (quantity[idx] < 5.0f))",
        ),
        (
            "price > 10 OR quantity < 5",
            "((price[idx] > 10.0f) || (quantity[idx] < 5.0f))",
        ),
        # precedence_tests.cpp
        ("price + quantity * 2", "(price[idx] + (quantity[idx] * 2.0f))"),
        ("(price + quantity) * 2", "((price[idx] + quantity[idx]) * 2.0f)"),
    ],
)
def test_expression_golden(text, golden):
    assert parse_expression(tokenize(text)).canonical() == golden


# --- error paths -------------------------------------------------------------


def test_malformed_expression():
    with pytest.raises(ParseError, match="Unexpected token"):
        parse_expression(tokenize("1 2"))


def test_invalid_character():
    with pytest.raises(TokenizeError, match="Unknown character"):
        tokenize("price & 5")


def test_tokenize_error_line_column():
    with pytest.raises(TokenizeError) as exc:
        tokenize("price # 1\n")
    assert "line 1" in str(exc.value)
    assert "column" in str(exc.value)


def test_unbalanced_parentheses():
    with pytest.raises(ParseError, match="Expected '\\)'"):
        parse_expression(tokenize("(price + 5"))


def test_unexpected_token_query():
    # `FROM test EXTRA` now parses (EXTRA is a table alias, standard
    # SQL); a second trailing identifier is still an error.
    with pytest.raises(ParseError, match="Unexpected token"):
        parse_query(tokenize("SELECT price FROM test EXTRA EXTRA2"))


def test_from_alias_parses():
    q = parse_query(tokenize("SELECT s.price FROM test AS s"))
    assert q.from_table == "s" and q.from_source == "test"
    q = parse_query(tokenize("SELECT s.price FROM test s"))
    assert q.from_table == "s" and q.from_source == "test"
    q = parse_query(tokenize(
        "SELECT a.x FROM t a JOIN u AS b ON a.x = b.x"
    ))
    assert q.joins[0].table == "b" and q.joins[0].source == "u"
    assert "FROM t AS a" in q.canonical()
    assert "JOIN u AS b" in q.canonical()


def test_parse_query_error_line_column():
    with pytest.raises(ParseError) as exc:
        parse_query(tokenize("SELECT price"))
    assert "line" in str(exc.value)
    assert "column" in str(exc.value)


def test_limit_requires_number():
    with pytest.raises(ParseError, match="Expected numeric value after LIMIT"):
        parse_query(tokenize("SELECT price FROM t LIMIT x"))


# --- query_parser_test.cpp ----------------------------------------------------


def test_full_query_parse():
    q = parse_query(
        tokenize(
            "SELECT SUM(price), quantity FROM sales JOIN items ON "
            "sales.id = items.id WHERE price > 10 GROUP BY quantity "
            "ORDER BY price DESC LIMIT 5"
        )
    )
    assert len(q.select_list) == 2
    assert isinstance(q.select_list[0], Aggregation)
    assert q.select_list[0].agg is AggregationType.SUM
    assert q.joins and q.joins[0].table == "items"
    assert q.where is not None
    assert q.group_by is not None
    assert q.order_by is not None and not q.order_by.ascending
    assert q.limit == 5
    assert q.from_table == "sales"


def test_distinct_and_offset_orders():
    q = parse_query(tokenize("SELECT DISTINCT quantity FROM t LIMIT 3 OFFSET 1"))
    assert q.distinct and q.limit == 3 and q.offset == 1
    # Reference's own sql_features_test.cpp:33 writes OFFSET before LIMIT.
    q2 = parse_query(
        tokenize("SELECT price FROM test ORDER BY price DESC OFFSET 1 LIMIT 2")
    )
    assert q2.offset == 1 and q2.limit == 2


def test_having_with_aggregate():
    q = parse_query(
        tokenize(
            "SELECT SUM(price) FROM test GROUP BY quantity HAVING SUM(price) > 15"
        )
    )
    assert q.having is not None
    aggs = [n for n in _walk(q.having) if isinstance(n, Aggregation)]
    assert len(aggs) == 1 and aggs[0].agg is AggregationType.SUM


def _walk(node):
    from warpdb_tpu.frontend import walk

    return list(walk(node))


def test_multi_join():
    q = parse_query(
        tokenize(
            "SELECT a FROM t JOIN u ON t.id = u.id JOIN v ON u.id = v.id WHERE a > 1"
        )
    )
    assert [j.table for j in q.joins] == ["u", "v"]
    assert q.where is not None


def test_window_function_parse():
    q = parse_query(
        tokenize(
            "SELECT SUM(price) OVER (PARTITION BY quantity ORDER BY price ASC) FROM t"
        )
    )
    w = q.select_list[0]
    assert isinstance(w, WindowFunction)
    assert w.agg is AggregationType.SUM
    assert len(w.partition_by) == 1
    assert w.order_by is not None and w.order_by.ascending


def test_group_by_multiple_keys():
    q = parse_query(tokenize("SELECT SUM(x) FROM t GROUP BY a, b ORDER BY a"))
    assert q.group_by is not None and len(q.group_by.keys) == 2


def test_invalid_aggregation_syntax():
    with pytest.raises(ParseError, match="Invalid syntax for SUM aggregation"):
        parse_query(tokenize("SELECT SUM price FROM t"))


# --- identifier_validation_test.cpp ------------------------------------------


def test_unknown_column_validation():
    q = parse_query(tokenize("SELECT foo FROM test"))
    with pytest.raises(ValidationError, match="Unknown column"):
        validate_expression(q.select_list[0], {"price", "quantity"})


def test_validate_query_context_labels():
    q = parse_query(tokenize("SELECT price FROM test WHERE bogus > 1"))
    with pytest.raises(ValidationError, match="WHERE clause: Unknown column: bogus"):
        validate_query(q, {"price", "quantity"})


def test_qualified_column_against_table():
    q = parse_query(tokenize("SELECT sales.price FROM sales"))
    validate_expression(q.select_list[0], {"price"}, table_names={"sales"})
    with pytest.raises(ValidationError):
        validate_expression(q.select_list[0], {"price"}, table_names=set())


# --- reentrancy (the reference parser used global mutable state) -------------


def test_parser_reentrant():
    import concurrent.futures

    texts = ["price + %d" % i for i in range(64)]

    def parse_one(t):
        return parse_expression(tokenize(t)).canonical()

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(parse_one, texts))
    assert results == [f"(price[idx] + {i}.0f)" for i in range(64)]


def test_rank_not_reserved():
    # ROW_NUMBER/RANK are contextual, not reserved: a column named 'rank'
    # still parses as an identifier everywhere.
    from warpdb_tpu.frontend import parse_query_text, tokenize, TokenType

    toks = tokenize("rank")
    assert toks[0].type is TokenType.IDENTIFIER
    q = parse_query_text("SELECT rank FROM t WHERE rank > 3 ORDER BY rank ASC")
    assert q.select_list[0].canonical() == "rank[idx]"


# --- expression subqueries (extension) ---------------------------------------


def test_parse_expression_subqueries():
    from warpdb_tpu.frontend import parse_query_text
    from warpdb_tpu.frontend.ast import InSubquery, ScalarSubquery, BinaryOp

    q = parse_query_text(
        "SELECT p FROM t WHERE p > (SELECT AVG(p) FROM t) "
        "AND k IN (SELECT k FROM d WHERE flag > 0)"
    )
    cond = q.where
    assert isinstance(cond, BinaryOp) and cond.op == "&&"
    assert isinstance(cond.left.right, ScalarSubquery)
    assert isinstance(cond.right, InSubquery)
    # Inner query parses fully (its own WHERE survives).
    assert cond.right.query.where is not None
    # Canonical embeds the inner statements (cache-key correctness).
    assert "SELECT AVG(p[idx]) FROM t" in q.canonical()
    assert "IN (SELECT k[idx] FROM d" in q.canonical()
    # A parenthesised non-subquery expression still parses as grouping.
    q2 = parse_query_text("SELECT (p + 1) * 2 FROM t")
    assert q2.select_list[0].canonical() == "((p[idx] + 1.0f) * 2.0f)"


def test_parse_not_in_subquery():
    from warpdb_tpu.frontend import parse_query_text

    q = parse_query_text("SELECT p FROM t WHERE k NOT IN (SELECT k FROM d)")
    # NOT IN wraps the positive membership in == 0.
    assert q.where.op == "=="
    assert q.where.right.canonical() == "0.0f"
