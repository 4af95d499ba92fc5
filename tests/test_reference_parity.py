"""Byte-parity against the reference's OWN prep scripts.

Runs /root/reference/scripts/extract_vocabs.py + map_dataset.py (read-only,
executed from a temp cwd; a stub mmh3 satisfies their unconditional import —
the hash path itself is not exercised) on a small .nq.gz fixture, then
asserts OUR pipeline produces byte-identical artifacts:

  - the three vocab files (term per line, frequency-desc, first-occurrence
    tie-break)  ==  export_vocab_text output;
  - .mapped.unsorted (id triples in corpus order, duplicates kept)  ==  our
    encoded mentions ordered by corpus position;
  - sorted-unique mapped  ==  our deduped SPO permutation (the check_index
    contract, /root/reference/test/check_index.cpp:9-40).
"""

from __future__ import annotations

import gzip
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from rdf_indexes_spark.operators import encode as enc
from rdf_indexes_spark.operators import permutations as perm
from rdf_indexes_spark.sources.ntriples import rdf_to_mentions, read_ntriples

REF_SCRIPTS = "/root/reference/scripts"

NQ_FIXTURE = """\
<http://ex/s1> <http://ex/p1> <http://ex/o1> <http://g/1> .
<http://ex/s1> <http://ex/p1> "a literal"@en <http://g/1> .
<http://ex/s2> <http://ex/p2> "typed"^^<http://www.w3.org/2001/XMLSchema#string> <http://g/2> .
<http://ex/s1> <http://ex/p1> <http://ex/o1> <http://g/1> .
<http://ex/s3> <http://ex/p1> <http://ex/o2> <http://g/3> .
<http://ex/s2> <http://ex/p1> <http://ex/o1> <http://g/1> .
<http://ex/s3> <http://ex/p2> <http://ex/o2> <http://g/2> .
"""


@pytest.fixture(scope="module")
def ref_outputs(tmp_path_factory):
    if not os.path.isdir(REF_SCRIPTS):
        pytest.skip("reference scripts not available")
    d = tmp_path_factory.mktemp("refpar")
    # stub mmh3: the scripts import it unconditionally; only --hash uses it
    (d / "mmh3.py").write_text("def hash64(*a, **k):\n    raise NotImplementedError\n")
    nq = d / "fixture.nq.gz"
    with gzip.open(nq, "wt") as f:
        f.write(NQ_FIXTURE)
    env = {**os.environ, "PYTHONPATH": f"{d}{os.pathsep}{REF_SCRIPTS}"}
    r1 = subprocess.run(
        [sys.executable, os.path.join(REF_SCRIPTS, "extract_vocabs.py"), str(nq), "-S", "-P", "-O"],
        capture_output=True, text=True, env=env, cwd=d, timeout=120,
    )
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [sys.executable, os.path.join(REF_SCRIPTS, "map_dataset.py"), str(nq)],
        capture_output=True, text=True, env=env, cwd=d, timeout=120,
    )
    assert r2.returncode == 0, r2.stderr
    prefix = str(nq)[: -len(".gz")]
    read = lambda suf: open(prefix + "." + suf).read().splitlines()
    return {
        "s": read("subjects_vocab"),
        "p": read("predicates_vocab"),
        "o": read("objects_vocab"),
        "mapped": read("mapped.unsorted"),
        "dir": d,
        "nq": str(nq),
    }


def test_vocabs_and_mapping_byte_parity(spark, ref_outputs, tmp_path):
    mentions = rdf_to_mentions(read_ntriples(spark, ref_outputs["nq"], fmt="nq"))
    vocabs = enc.build_vocabs(mentions)
    # vocab files: identical term order (freq desc, first-occurrence ties)
    for role in ("s", "p", "o"):
        out = str(tmp_path / f"{role}_vocab")
        perm.export_vocab_text(vocabs[role], out, num_partitions=2)
        ours = []
        for fname in sorted(os.listdir(out)):
            if fname.startswith("part-"):
                ours.extend(open(os.path.join(out, fname)).read().splitlines())
        assert ours == ref_outputs[role], f"vocab role {role}"
    # mapped.unsorted: same id triples in corpus order, duplicates kept
    encoded, quarantine = enc.encode_mentions(mentions, vocabs)
    assert quarantine.count() == 0
    ours_mapped = [
        f"{r.s} {r.p} {r.o}"
        for r in encoded.orderBy("conv_id", "turn_idx", "mention_idx")
        .select("s", "p", "o")
        .collect()
    ]
    assert ours_mapped == ref_outputs["mapped"]
    # check_index contract: sorted-unique mapped == our SPO permutation
    want = sorted({tuple(int(x) for x in ln.split()) for ln in ref_outputs["mapped"]})
    triples = perm.dedup_triples(encoded)
    got = [
        (r.s, r.p, r.o)
        for r in triples.orderBy("s", "p", "o").collect()
    ]
    assert got == want


def test_parity_on_generated_corpus(spark, tmp_path):
    """Same byte-parity contract on a 2000-line generated NQ corpus with
    zipf-ish term reuse (frequency ties are common → the first-occurrence
    tie-break is genuinely exercised), literals, and duplicate lines."""
    if not os.path.isdir(REF_SCRIPTS):
        pytest.skip("reference scripts not available")
    import random

    rng = random.Random(99)
    lines = []
    for i in range(2000):
        s = f"http://ex/s{int(rng.paretovariate(1.2)) % 97}"
        p = f"http://ex/p{rng.randrange(7)}"
        if rng.random() < 0.25:
            o_term = f'some literal {rng.randrange(40)}'
            o = f'"{o_term}"@en'
        else:
            o = f"<http://ex/o{int(rng.paretovariate(1.1)) % 211}>"
        lines.append(f"<{s}> <{p}> {o} <http://g/{rng.randrange(3)}> .")
    # duplicates on purpose
    lines += lines[:50]
    nq = tmp_path / "gen.nq.gz"
    with gzip.open(nq, "wt") as f:
        f.write("\n".join(lines) + "\n")
    (tmp_path / "mmh3.py").write_text("def hash64(*a, **k):\n    raise NotImplementedError\n")
    env = {**os.environ, "PYTHONPATH": f"{tmp_path}{os.pathsep}{REF_SCRIPTS}"}
    for script, extra in (("extract_vocabs.py", ["-S", "-P", "-O"]), ("map_dataset.py", [])):
        r = subprocess.run(
            [sys.executable, os.path.join(REF_SCRIPTS, script), str(nq), *extra],
            capture_output=True, text=True, env=env, cwd=tmp_path, timeout=300,
        )
        assert r.returncode == 0, r.stderr
    prefix = str(nq)[: -len(".gz")]
    ref = {suf: open(prefix + "." + suf).read().splitlines()
           for suf in ("subjects_vocab", "predicates_vocab", "objects_vocab", "mapped.unsorted")}

    mentions = rdf_to_mentions(read_ntriples(spark, str(nq), fmt="nq"))
    vocabs = enc.build_vocabs(mentions)
    for role, suf in (("s", "subjects_vocab"), ("p", "predicates_vocab"), ("o", "objects_vocab")):
        out = str(tmp_path / f"v_{role}")
        perm.export_vocab_text(vocabs[role], out, num_partitions=3)
        ours = []
        for fname in sorted(os.listdir(out)):
            if fname.startswith("part-"):
                ours.extend(open(os.path.join(out, fname)).read().splitlines())
        assert ours == ref[suf], f"vocab {role}"
    encoded, quarantine = enc.encode_mentions(mentions, vocabs)
    assert quarantine.count() == 0
    ours_mapped = [
        f"{r.s} {r.p} {r.o}"
        for r in encoded.orderBy("conv_id").select("s", "p", "o").collect()
    ]
    assert ours_mapped == ref["mapped.unsorted"]
