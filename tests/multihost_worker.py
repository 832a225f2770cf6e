"""Worker for the real multi-process test (launched by test_multihost.py).

Each process joins a jax.distributed job over loopback with 2 virtual CPU
devices (4 global devices across 2 processes), ingests only its
host_shard_range slice, assembles the global table, and runs the
distributed GROUP BY.  Results are replicated, so every process checks
them against the full-table oracle independently.
"""

import sys

import numpy as np


def main() -> int:
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 2 * nprocs

    from warpdb_tpu.frontend import parse_expression_text
    from warpdb_tpu.parallel import multihost
    from warpdb_tpu.parallel.sharded import run_grouped_sharded
    from warpdb_tpu.storage import HostTable

    mesh = multihost.global_mesh()
    total = 6000
    rng = np.random.default_rng(0)  # same data derivable on every host
    price = rng.uniform(0, 100, total).astype(np.float32)
    k = rng.integers(0, 16, total).astype(np.float32)

    start, end = multihost.host_shard_range(total)
    local = HostTable.from_dict({"price": price[start:end], "k": k[start:end]})
    table = multihost.make_global_table(local, total, mesh)

    keys = [parse_expression_text("k")]
    vals = [parse_expression_text("price")]
    cond = parse_expression_text("price > 50")
    out_keys, out_counts, out_vals, num_groups = run_grouped_sharded(
        keys, vals, cond, table, capacity=32, mesh=mesh
    )
    ng = int(num_groups)

    mask = price > 50
    uniq = np.sort(np.unique(k[mask]))
    assert ng == len(uniq), (ng, len(uniq))
    got_keys = np.asarray(out_keys[0])[:ng]
    np.testing.assert_allclose(got_keys, uniq)
    want_counts = np.array([(k[mask] == u).sum() for u in uniq])
    np.testing.assert_array_equal(np.asarray(out_counts)[:ng], want_counts)
    want_sums = np.array([price[mask][k[mask] == u].sum() for u in uniq])
    np.testing.assert_allclose(
        np.asarray(out_vals[0][0])[:ng], want_sums, rtol=1e-4
    )

    # Distributed ORDER BY ... LIMIT across processes: replicated output,
    # every process checks against the full-table oracle.
    from warpdb_tpu.parallel.sharded import run_topk_sharded

    topk, n_match = run_topk_sharded(
        parse_expression_text("price"),
        parse_expression_text("price > 50"),
        table,
        8,
        False,
        mesh=mesh,
    )
    want = np.sort(price[price > 50])[::-1][:8]
    np.testing.assert_allclose(np.asarray(topk)[: len(want)], want, rtol=1e-6)
    assert n_match == int((price > 50).sum())

    # End-to-end SQL across processes, with a STRING group key: the
    # vocabulary is exchanged process-wide and column stats reduce
    # globally (make_global_table), so every process traces identical
    # stats-gated programs and codes are comparable everywhere
    # (VERDICT r1 item 3).
    from warpdb_tpu import WarpDB

    cities = np.array(["ams", "ber", "cdg", "lhr"], dtype=object)
    city = cities[rng.integers(0, 4, total)]
    local2 = HostTable.from_dict(
        {
            "price": price[start:end],
            "city": city[start:end],
        }
    )
    table2 = multihost.make_global_table(local2, total, mesh)
    assert "city" in table2.dicts and len(table2.dicts["city"]) == 4
    db = WarpDB.from_device_table(table2, mesh=mesh, name="t")
    got = np.asarray(
        db.query_sql(
            "SELECT SUM(price) FROM t WHERE city != 'zzz' "
            "GROUP BY city ORDER BY city ASC"
        )
    )
    want = np.array(
        [price[city == c].sum() for c in sorted(set(city))], np.float32
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # High-cardinality grouped SQL across processes: the key range
    # exceeds distributed_small_keys, so this exercises the map-side
    # combine + all-to-all shuffle over the PROCESS-SPANNING mesh.
    hk = rng.integers(0, 20_000, total).astype(np.float32)
    local3 = HostTable.from_dict(
        {"price": price[start:end], "hk": hk[start:end]}
    )
    table3 = multihost.make_global_table(local3, total, mesh)
    db3 = WarpDB.from_device_table(table3, mesh=mesh, name="t")
    got3 = np.asarray(
        db3.query_sql(
            "SELECT COUNT(price) FROM t GROUP BY hk ORDER BY hk ASC"
        )
    )
    uniq3, want3 = np.unique(hk, return_counts=True)
    assert len(got3) == len(uniq3), (len(got3), len(uniq3))
    np.testing.assert_array_equal(got3, want3.astype(np.float32))

    # Star-schema JOIN + GROUP BY across processes through plain SQL:
    # the fact table spans both processes, the dimension registers
    # host-side and reshards through the distributed join route.
    qty = rng.integers(0, 16, total).astype(np.float32)
    local4 = HostTable.from_dict(
        {"price": price[start:end], "qty": qty[start:end]}
    )
    table4 = multihost.make_global_table(local4, total, mesh)
    db4 = WarpDB.from_device_table(table4, mesh=mesh, name="t")
    rate = (np.arange(16, dtype=np.float32) + 1.0) / 16.0
    db4.register_table(
        "rates",
        HostTable.from_dict(
            {"q": np.arange(16, dtype=np.float32), "rate": rate}
        ),
    )
    got4 = np.asarray(
        db4.query_sql(
            "SELECT SUM(price * rates.rate) FROM t "
            "JOIN rates ON qty = rates.q GROUP BY qty ORDER BY qty ASC"
        )
    )
    want4 = np.array(
        [
            (price[qty == u] * rate[int(u)]).sum()
            for u in np.sort(np.unique(qty))
        ],
        np.float32,
    )
    np.testing.assert_allclose(got4, want4, rtol=1e-4)

    # APPROX_COUNT_DISTINCT over the process-spanning mesh matches the
    # replicated single-program estimate (same registers everywhere).
    got5 = np.asarray(
        db3.query_sql(
            "SELECT APPROX_COUNT_DISTINCT(hk) FROM t GROUP BY hk "
            "ORDER BY hk ASC LIMIT 3"
        )
    )
    np.testing.assert_allclose(got5, np.ones(3, np.float32), rtol=0.05)

    print(f"proc {proc_id}: OK ({ng} groups over {nprocs} processes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
