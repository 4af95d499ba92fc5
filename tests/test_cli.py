"""Smoke tests for the CLI drivers (the reference's build / queries /
statistics / build_permutation executables, src/*.cpp) via subprocess.

Wall-time design: every scenario is a chain of CLI subprocesses, and a
subprocess is ~9s of JVM+session startup that burns ~2s of CPU — pure
wait. So the module-scoped `cli_runs` fixture launches every chain
CONCURRENTLY (dependency-ordered futures on a thread pool: builds
first, dependent reads/ingests chained behind their build's future) and
each test just joins its chain and asserts. Serial, this tier was ~5.5
minutes of suite wall; in waves it is bounded by the longest single
chain (~1 minute). Assertions are unchanged — a chain failure surfaces
in the owning test via future.result()."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NT = """\
<http://ex/s1> <http://ex/p1> <http://ex/o1> .
<http://ex/s1> <http://ex/p1> "a literal"@en .
<http://ex/s2> <http://ex/p2> <http://ex/o1> .
<http://ex/s1> <http://ex/p1> <http://ex/o1> .
<http://ex/s3> <http://ex/p1> <http://ex/o2> .
"""


def _run(*argv: str, cwd: str = REPO) -> subprocess.CompletedProcess:
    env = {**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_DRIVER_MEM": "4g"}
    return subprocess.run(
        [sys.executable, "-m", "rdf_indexes_spark", "--cores", "4", *argv],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
        timeout=300,
    )


def _write_transcripts_parquet(path: str, n_turns: int, seed: int) -> None:
    """Fixture transcripts via pyarrow — NOT an in-process SparkSession:
    get_spark().stop() here would kill the suite's shared session-scoped
    SparkContext (getOrCreate returns the same JVM context), breaking
    every later test module."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_indexes_spark.synth import generate

    table = pa.Table.from_pandas(generate(n_turns, seed=seed).transcripts, preserve_index=False)
    pq.write_table(table, path, coerce_timestamps="us", allow_truncated_timestamps=True)


def _copy_index(idx: str, dest: str) -> str:
    shutil.copytree(idx, dest, symlinks=True)
    return dest


@pytest.fixture(scope="module")
def cli_runs(tmp_path_factory, cli_tx_index):
    """Every CLI chain, launched concurrently (see module docstring).
    The transcripts build comes from the session-shared conftest
    fixture (one subprocess pipeline for the whole suite). Returns
    {chain name: Future}; tests join + assert."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    d = tmp_path_factory.mktemp("cli")
    (d / "fixture.nt").write_text(NT)
    delta_src = str(d / "delta.parquet")
    _write_transcripts_parquet(delta_src, 150, seed=4)
    feed = d / "feed"
    feed.mkdir()
    _write_transcripts_parquet(str(feed / "drop1.parquet"), 120, seed=12)

    def build_nt():
        idx = str(d / "idx")
        r = _run("build", "--input", str(d / "fixture.nt"), "--format", "nt", "--out", idx)
        assert r.returncode == 0, r.stderr[-2000:]
        rep = json.loads(r.stdout.strip().splitlines()[-1])
        assert rep["num_triples"] == 4  # one duplicate removed
        return idx

    ex = ThreadPoolExecutor(max_workers=10)
    f_nt = ex.submit(build_nt)
    f_tx = ex.submit(lambda: cli_tx_index[1:])

    def after(dep, fn):
        return ex.submit(lambda: fn(dep.result()))

    futures = {
        "nt": f_nt,
        "tx": f_tx,
        "statistics": after(f_nt, lambda idx: _run("statistics", "--index", idx)),
        "queries_perm": after(f_nt, lambda idx: _chain_queries_perm(d, idx)),
        "profile": after(f_nt, lambda idx: _run("profile", "--index", idx, "-n", "4", "--runs", "1")),
        "sparql": after(f_nt, lambda idx: _chain_sparql(idx)),
        "mmh3": ex.submit(lambda: _run(
            "build", "--input", str(d / "fixture.nt"), "--format", "nt",
            "--hash", "--hash-fn", "mmh3", "--out", str(d / "idx_mmh3"))),
        "2tp": ex.submit(lambda: _chain_2tp(d)),
        "pefr": ex.submit(lambda: _chain_pefr(d)),
        "tx_ops": after(f_tx, lambda tx: _chain_tx_ops(d, tx[0])),
        "stream": after(f_tx, lambda tx: _chain_stream(d, tx[0])),
    }
    yield d, futures
    ex.shutdown(wait=False, cancel_futures=True)


def _chain_queries_perm(d, idx):
    qf = d / "queries.txt"
    # vocab ids: s1 -> 0 (3 subject occurrences); p1 -> 0; full scan; ?P?
    qf.write_text("0 0 -1\n-1 -1 -1\n-1 0 -1\n")
    rq = _run("queries", "--index", idx, "--queries", str(qf), "--batched")
    out_pos = str(d / "pos_only")
    rp = _run("build_permutation", "--input", idx, "--perm", "pos", "--out", out_pos)
    return rq, rp, out_pos


def _chain_sparql(idx):
    # repeatable --query: one subprocess, one json line per query in
    # order; a bad query mid-batch emits an {"error": ...} line, the
    # rest of the batch still runs, and the exit code flags the failure
    return _run(
        "sparql", "--index", idx,
        "--query", "SELECT ?s WHERE { ?s <http://ex/p1> <http://ex/o1> } ORDER BY ?s",
        "--query", "ASK { <http://ex/s3> <http://ex/p1> <http://ex/o2> }",
        "--query", "THIS IS NOT SPARQL",
        "--query", "ASK { <http://ex/s3> <http://ex/p2> <http://ex/o2> }",
    )


def _chain_2tp(d):
    idx = str(d / "idx2tp")
    rb = _run("build", "--input", str(d / "fixture.nt"), "--format", "nt",
              "--out", idx, "--variant", "2tp")
    if rb.returncode != 0:
        return rb, None, idx
    qf = d / "queries_2tp.txt"
    # ??O (osp route, absent), S?O (osp route, absent), ?PO (pos, present)
    qf.write_text("-1 -1 0\n0 -1 0\n-1 0 0\n")
    rq = _run("queries", "--index", idx, "--queries", str(qf), "--batched")
    return rb, rq, idx


def _chain_pefr(d):
    idx = str(d / "idxr")
    r = _run("build", "--input", str(d / "fixture.nt"), "--format", "nt",
             "--out", idx, "--variant", "pef_r")
    return r, idx


def _chain_tx_ops(d, built_idx):
    # ingest+compact mutate the index — run on a copy, so the shared
    # build stays pristine for the stream chain
    idx = _copy_index(built_idx, str(d / "idx_tx_ops"))
    # sampled + stamped workload through the symlinked index
    # (reference driver flags -n/-w/perm, src/queries.cpp:50-93)
    rq = _run("queries", "--index", idx, "-n", "5", "-w", "1", "--perm", "spo", "--batched")
    ri = _run("ingest", "--index", idx, "--input", str(d / "delta.parquet"))
    rc = _run("compact", "--index", idx)
    rs = _run("statistics", "--index", idx)
    return rq, ri, rc, rs


def _chain_stream(d, built_idx):
    idx = _copy_index(built_idx, str(d / "idx_stream"))
    ckpt = str(d / "ckpt")
    r1 = _run("stream-ingest", "--index", idx, "--feed", str(d / "feed"),
              "--checkpoint", ckpt, "--timeout", "240")
    r2 = _run("stream-ingest", "--index", idx, "--feed", str(d / "feed"),
              "--checkpoint", ckpt, "--timeout", "240")
    return idx, r1, r2


def test_cli_statistics(cli_runs):
    d, fut = cli_runs
    idx = fut["nt"].result()
    r = fut["statistics"].result()
    assert r.returncode == 0, r.stderr[-2000:]
    out = dict(
        line.split(": ") for line in r.stdout.splitlines() if ": " in line and "perm " not in line
    )
    assert out["num_triples"] == "4"
    assert out["distinct_predicates"] == "2"
    # stats.txt written in reference format: 7 integer lines
    with open(os.path.join(idx, "stats.txt")) as f:
        lines = f.read().split()
    assert len(lines) == 7 and lines[0] == "4"


def test_cli_queries_and_build_permutation(cli_runs):
    _, fut = cli_runs
    rq, rp, out_pos = fut["queries_perm"].result()
    assert rq.returncode == 0, rq.stderr[-2000:]
    rep = json.loads(rq.stdout.strip().splitlines()[-1])
    assert rep["queries"] == 3
    # S=0,P=0 matches s1's 2 distinct triples; full scan 4; ?P=0? is 3
    assert rep["triples"] == 2 + 4 + 3
    assert rp.returncode == 0, rp.stderr[-2000:]
    assert any(f.endswith(".parquet") for f in os.listdir(out_pos))


def test_cli_build_transcripts(cli_runs):
    """build --format transcripts with a RELATIVE --out: full KG pipeline
    via CLI, index layout complete AND consumable — the perms5 symlink must
    resolve from the link's own directory, statistics must find
    <index>/stats, queries must run through the symlinked layout, and an
    ingest+compact cycle must grow the tracked stats."""
    _, fut = cli_runs
    idx, rep = fut["tx"].result()
    assert os.path.isdir(os.path.join(idx, "perms5")), "perms5 symlink must resolve"
    assert os.path.isdir(os.path.join(idx, "stats"))
    with open(os.path.join(idx, "stats.txt")) as f:
        assert len(f.read().split()) == 7
    assert os.path.isdir(os.path.join(idx, "vocabs", "s_vocab"))

    rq, ri, rc, rs = fut["tx_ops"].result()
    assert rq.returncode == 0, rq.stderr[-2000:]
    qrep = json.loads(rq.stdout.strip().splitlines()[-1])
    assert qrep["queries"] == 5
    assert qrep["triples"] >= 5  # S P ? supersets each sampled triple

    assert ri.returncode == 0, ri.stderr[-2000:]
    irep = json.loads(ri.stdout.strip().splitlines()[-1])
    assert irep["new_triples"] > 0
    assert irep["total_triples"] == rep["num_triples"] + irep["new_triples"]
    assert rc.returncode == 0, rc.stderr[-2000:]
    assert rs.returncode == 0, rs.stderr[-2000:]
    out2 = dict(
        line.split(": ") for line in rs.stdout.splitlines() if ": " in line and "perm " not in line
    )
    assert int(out2["num_triples"]) == irep["total_triples"]


def test_cli_reduced_variant_batched_queries(cli_runs):
    """A reduced 2tp index (SPO+POS only) must answer EVERY wildcard class
    in --batched mode via the router's longest-bound-prefix fallback —
    ??O and S?O route to the absent osp table and must fall back, not
    KeyError (the equi-join on bound columns is order-independent)."""
    _, fut = cli_runs
    rb, rq, idx = fut["2tp"].result()
    assert rb.returncode == 0, rb.stderr[-2000:]
    # only spo+pos on disk
    perms_on_disk = {e for e in os.listdir(os.path.join(idx, "perms5")) if e.startswith("perm=")}
    assert perms_on_disk == {"perm=1", "perm=2"}
    assert rq.returncode == 0, rq.stderr[-2000:]
    rep = json.loads(rq.stdout.strip().splitlines()[-1])
    assert rep["queries"] == 3
    # o=0 is ex/o1 (2 triples: s1 p1 o1, s2 p2 o1); S=0?O=0 -> 1; ?P=0 O=0 -> 1
    assert rep["triples"] == 2 + 1 + 1


def test_cli_pef_r_variant(cli_runs):
    """--variant pef_r: the 3t trio plus the rank-remapped POS table
    (pef_r_3t, include/types.hpp:70-77). DuckDB plays the independent
    decode oracle: re-rank OSP's per-object subject lists and join the
    remapped rows back — must reproduce the SPO permutation exactly."""
    import duckdb

    _, fut = cli_runs
    r, idx = fut["pefr"].result()
    assert r.returncode == 0, r.stderr[-2000:]
    on_disk = {e for e in os.listdir(os.path.join(idx, "perms5")) if e.startswith("perm=")}
    assert on_disk == {"perm=1", "perm=2", "perm=3"}  # spo, pos, osp
    assert os.path.isdir(os.path.join(idx, "pos_r"))
    con = duckdb.connect()
    spo = con.sql(
        f"SELECT c1 AS s, c2 AS p, c3 AS o FROM read_parquet('{idx}/perms5/perm=1/*.parquet') ORDER BY 1, 2, 3"
    ).fetchall()
    back = con.sql(
        f"""
        WITH osp AS (SELECT c1 AS o, c2 AS s FROM read_parquet('{idx}/perms5/perm=3/*.parquet')),
        r AS (SELECT o, s, CAST(row_number() OVER (PARTITION BY o ORDER BY s) - 1 AS BIGINT) AS s_rank
              FROM (SELECT DISTINCT o, s FROM osp)),
        m AS (SELECT p, o, s_rank FROM read_parquet('{idx}/pos_r/*.parquet'))
        SELECT r.s, m.p, m.o FROM m JOIN r USING (o, s_rank) ORDER BY 1, 2, 3
        """
    ).fetchall()
    assert [tuple(x) for x in back] == [tuple(x) for x in spo]


def test_cli_profile(cli_runs):
    """`profile` (the reference's benchmark/profile.cpp analog) emits one
    json line per (trie, level) with the profile.cpp stat fields; scan /
    access / find rates are positive, nodes_bpt finite."""
    _, fut = cli_runs
    r = fut["profile"].result()
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.splitlines() if line.startswith("{")]
    # 5 permutations x levels 2,3
    assert len(rows) == 10
    perms = {r_["perm"] for r_ in rows}
    assert perms == {"spo", "pos", "osp", "ops", "pso"}
    for row in rows:
        assert row["level"] in ("2", "3")
        assert row["nodes_bpt"] >= 0
        assert row["scan_ns_per_int"] > 0
        assert row["access_musec_per_query"] > 0
        assert row["find_musec_per_query"] > 0


def test_cli_sparql(cli_runs):
    """`sparql` over an nt-built index: constants resolve through the
    vocab text files, patterns route through the permutation layout,
    results decode back to surface forms."""
    _, fut = cli_runs
    r = fut["sparql"].result()
    assert r.returncode == 1, r.stderr[-2000:]  # one failed query in the batch
    lines = [json.loads(x) for x in r.stdout.strip().splitlines() if x.startswith("{")]
    assert len(lines) == 4
    rep = lines[0]
    assert rep["vars"] == ["s"] and rep["rows"] == 1
    assert rep["data"] == [["http://ex/s1"]]  # NT vocab terms are bracket-stripped
    assert lines[1]["ask"] is True
    assert "error" in lines[2] and lines[2]["query"] == "THIS IS NOT SPARQL"
    assert lines[3]["ask"] is False  # the batch continued past the failure


def test_cli_build_hash_mmh3_encodes(cli_runs):
    """Regression: `build --hash --hash-fn mmh3` must actually encode —
    the mmh3 vocab's terms are hash strings, so the encode join needs
    the mention surfaces hashed identically; before the fix every
    mention was quarantined and an empty index was written."""
    _, fut = cli_runs
    r = fut["mmh3"].result()
    assert r.returncode == 0, r.stderr[-2000:]
    assert "quarantined" not in r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["num_triples"] == 4  # same dedup as the plain build


def test_cli_stream_ingest(cli_runs):
    """stream-ingest drains a feed dir into an existing transcripts index
    (a copy of the module-shared build): generations appear, statistics
    tracks growth, the idempotency manifest is written, and a second
    drain of the SAME feed applies nothing new."""
    _, fut = cli_runs
    _, rep = fut["tx"].result()
    idx, r1, r2 = fut["stream"].result()
    assert r1.returncode == 0, r1.stderr[-2000:]
    srep = json.loads(r1.stdout.strip().splitlines()[-1])
    assert srep["batches_applied"] == 1

    # growth checks read the stats parquet directly (what the statistics
    # CLI itself reads; its print path is covered by test_cli_statistics)
    def _num_triples() -> int:
        import pyarrow.parquet as pq

        return pq.read_table(os.path.join(idx, "stats")).to_pylist()[0]["num_triples"]

    grown = _num_triples()
    assert grown > rep["num_triples"]

    # re-drain of the same feed on the same checkpoint: no new batches, no growth
    assert r2.returncode == 0, r2.stderr[-2000:]
    srep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert srep2["batches_applied"] == 1
    assert _num_triples() == grown
