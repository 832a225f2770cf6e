"""DB-API 2.0 (PEP 249) interface over the engine.

Extension: the reference's only binding surface was the ad-hoc
pywarpdb module (pywarpdb.cpp:18-60); this exposes the engine to any
DB-API consumer (pandas.read_sql, ORMs, notebook magics).
"""

import numpy as np
import pytest

import warpdb_tpu.dbapi as dbapi
from warpdb_tpu.storage import HostTable


@pytest.fixture(scope="module")
def conn():
    c = dbapi.connect("data/test.csv")
    yield c
    c.close()


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.threadsafety >= 1
    assert dbapi.paramstyle == "format"
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_execute_fetch(conn):
    cur = conn.cursor()
    cur.execute(
        "SELECT quantity, SUM(price) FROM test GROUP BY quantity "
        "ORDER BY quantity"
    )
    assert cur.rowcount == 4
    assert cur.description[0][0] == "quantity"
    assert cur.description[0][1] == dbapi.NUMBER
    assert cur.fetchone() == (2.0, 15.25)
    assert cur.fetchmany(2) == [(3.0, 10.5), (4.0, 20.0)]
    assert cur.fetchall() == [(5.0, 30.0)]
    assert cur.fetchone() is None


def test_parameters(conn):
    cur = conn.cursor()
    cur.execute(
        "SELECT price FROM test WHERE price > %s AND quantity < %s",
        (15, 5),
    )
    assert cur.fetchall() == [(20.0,), (15.25,)]


def test_string_parameter_quoting():
    c = dbapi.connect(
        HostTable.from_dict(
            {
                "name": np.array(["a'b", "plain"], dtype=object),
                "v": np.array([1.0, 2.0], np.float32),
            }
        )
    )
    cur = c.cursor()
    cur.execute("SELECT v FROM t WHERE name == %s", ("a'b",))
    assert cur.fetchall() == [(1.0,)]
    assert cur.description[0][1] == dbapi.NUMBER
    cur.execute("SELECT name FROM t ORDER BY name")
    assert cur.description[0][1] == dbapi.STRING
    assert [r[0] for r in cur] == ["a'b", "plain"]


def test_iteration_and_context_managers():
    with dbapi.connect("data/test.csv") as c:
        with c.cursor() as cur:
            cur.execute("SELECT price FROM test ORDER BY price")
            assert [r[0] for r in cur] == [10.5, 15.25, 20.0, 30.0]
    with pytest.raises(dbapi.InterfaceError):
        c.cursor()


def test_error_mapping(conn):
    cur = conn.cursor()
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELECT nosuchcol FROM test")
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELEKT price FROM test")
    with pytest.raises(dbapi.ProgrammingError):
        cur.fetchall()  # failed execute leaves no result set


def test_transactions(conn):
    conn.commit()  # read-only: silent success
    with pytest.raises(dbapi.NotSupportedError):
        conn.rollback()


def test_register_table_and_join():
    c = dbapi.connect("data/test.csv")
    c.register_table(
        "rates",
        HostTable.from_dict(
            {
                "quantity": np.arange(8, dtype=np.float32),
                "rate": (np.arange(8) * 0.1).astype(np.float32),
            }
        ),
    )
    cur = c.cursor()
    cur.execute(
        "SELECT price, rate FROM test JOIN rates "
        "ON quantity = rates.quantity ORDER BY price LIMIT 2"
    )
    rows = cur.fetchall()
    assert rows[0][0] == 10.5
    assert rows[0][1] == pytest.approx(0.3, rel=1e-6)


def test_pandas_read_sql(conn):
    pd = pytest.importorskip("pandas")
    df = pd.read_sql(
        "SELECT quantity, SUM(price) AS total FROM test "
        "GROUP BY quantity ORDER BY quantity",
        conn,
    )
    assert list(df.columns) == ["quantity", "total"]
    assert df["total"].tolist() == [15.25, 10.5, 20.0, 30.0]


def test_executemany(conn):
    cur = conn.cursor()
    cur.executemany(
        "SELECT price FROM test WHERE quantity == %s", [(3,), (5,)]
    )
    # Last execution's results remain (PEP 249: executemany is for DML;
    # for queries we keep the final result set).
    assert cur.fetchall() == [(30.0,)]
