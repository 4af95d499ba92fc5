"""Pure-pandas reference implementation of the whole pipeline.

Plays the role the sorted text permutation files play in the reference's
tests (/root/reference/test/check_index.cpp:9-40 — golden triple-for-triple
equality): an independent, small-scale implementation of

  extract → link → canonicalize → vocab → encode → dedup → permutations → stats

whose outputs the Spark pipeline must match EXACTLY (id-level equality).

Semantics mirrored from the reference prep scripts:
- vocab ids: dense 0..n-1, descending frequency, ties by first occurrence
  in corpus scan order (/root/reference/scripts/extract_vocabs.py:64-67,
  /root/reference/scripts/map_dataset.py:16-26).
- three independent id spaces (subjects / predicates / objects)
  (/root/reference/scripts/extract_vocabs.py:29-31).
- dedup at sort time, sort -n -u (/root/reference/scripts/sort.py:6-10);
  the unsorted encoded stream retains duplicates & corpus order
  (/root/reference/scripts/map_dataset.py:43,67).
- stats: 7 counts (/root/reference/scripts/build_stats.py:9-16).
"""

from __future__ import annotations

import pandas as pd

from ..lexicon import MENTION_PATTERN, CUE_TO_PRED, SAME_AS, normalize_surface

PERM_ORDERS = {
    "spo": ["s", "p", "o"],
    "pos": ["p", "o", "s"],
    "osp": ["o", "s", "p"],
    "ops": ["o", "p", "s"],
    "pso": ["p", "s", "o"],
}


def extract_mentions_pd(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Regex mention extraction; one row per match, in-text match order."""
    out = []
    t = transcripts.sort_values(["conv_id", "turn_idx"], kind="stable")
    for conv_id, turn_idx, text in zip(t["conv_id"], t["turn_idx"], t["text"]):
        if not text:
            continue
        for m_idx, m in enumerate(MENTION_PATTERN.finditer(text)):
            out.append(
                (conv_id, int(turn_idx), m_idx, m.group("subj"),
                 CUE_TO_PRED[m.group("cue")], m.group("obj"))
            )
    return pd.DataFrame(out, columns=["conv_id", "turn_idx", "mention_idx", "subj", "pred", "obj"])


def link_edges_pd(mentions: pd.DataFrame) -> pd.DataFrame:
    """Candidate link edges: explicit sameAs statements + shared normkey."""
    same = mentions[mentions["pred"] == SAME_AS][["subj", "obj"]].rename(
        columns={"subj": "a", "obj": "b"}
    )
    facts = mentions[mentions["pred"] != SAME_AS]
    surfaces = pd.unique(pd.concat([facts["subj"], facts["obj"], same["a"], same["b"]]))
    sdf = pd.DataFrame({"surface": surfaces})
    sdf["normkey"] = sdf["surface"].map(normalize_surface)
    rep = sdf.groupby("normkey")["surface"].min().rename("rep")
    norm_edges = sdf.join(rep, on="normkey")
    norm_edges = norm_edges[norm_edges["surface"] != norm_edges["rep"]][["surface", "rep"]]
    norm_edges.columns = ["a", "b"]
    return pd.concat([same, norm_edges], ignore_index=True).drop_duplicates()


def connected_components_py(edges: pd.DataFrame, nodes: list[str]) -> dict[str, str]:
    """Union-find; component label = lexicographic min surface."""
    parent: dict[str, str] = {n: n for n in nodes}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["a"], edges["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def canonical_map_pd(mentions: pd.DataFrame) -> pd.DataFrame:
    """surface → canonical surface.

    Canonical representative of a component = most frequent surface across
    all fact-mention occurrences (subj+obj), ties by lexicographic min.
    """
    facts = mentions[mentions["pred"] != SAME_AS]
    occ = pd.concat([facts["subj"], facts["obj"]]).value_counts()
    edges = link_edges_pd(mentions)
    nodes = sorted(set(pd.concat([facts["subj"], facts["obj"], edges["a"], edges["b"]])))
    comp = connected_components_py(edges, nodes)
    df = pd.DataFrame({"surface": nodes})
    df["component"] = df["surface"].map(comp)
    df["freq"] = df["surface"].map(occ).fillna(0).astype(int)
    df = df.sort_values(["component", "freq", "surface"], ascending=[True, False, True], kind="stable")
    rep = df.groupby("component", sort=False)["surface"].first().rename("canonical")
    return df.join(rep, on="component")[["surface", "canonical"]]


def canonical_mentions_pd(mentions: pd.DataFrame) -> pd.DataFrame:
    """Fact mentions with surfaces replaced by canonical forms, corpus order."""
    facts = mentions[mentions["pred"] != SAME_AS].copy()
    cmap = canonical_map_pd(mentions).set_index("surface")["canonical"]
    facts["cs"] = facts["subj"].map(cmap)
    facts["co"] = facts["obj"].map(cmap)
    facts = facts.sort_values(["conv_id", "turn_idx", "mention_idx"], kind="stable").reset_index(drop=True)
    return facts[["conv_id", "turn_idx", "mention_idx", "cs", "pred", "co"]]


def build_vocab_pd(terms: pd.Series) -> pd.DataFrame:
    """(term, id): freq desc, ties by first occurrence (corpus scan order)."""
    df = pd.DataFrame({"term": terms.reset_index(drop=True)})
    df["pos"] = df.index
    g = df.groupby("term", sort=False).agg(cnt=("pos", "size"), first_pos=("pos", "min")).reset_index()
    g = g.sort_values(["cnt", "first_pos"], ascending=[False, True], kind="stable").reset_index(drop=True)
    g["id"] = g.index.astype("int64")
    return g[["term", "id", "cnt", "first_pos"]]


def run_oracle(transcripts: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Full golden pipeline; returns every intermediate + final table."""
    mentions = extract_mentions_pd(transcripts)
    cm = canonical_mentions_pd(mentions)
    vs = build_vocab_pd(cm["cs"])
    vp = build_vocab_pd(cm["pred"])
    vo = build_vocab_pd(cm["co"])
    enc = cm.copy()
    enc["s"] = enc["cs"].map(vs.set_index("term")["id"])
    enc["p"] = enc["pred"].map(vp.set_index("term")["id"])
    enc["o"] = enc["co"].map(vo.set_index("term")["id"])
    unsorted = enc[["s", "p", "o"]].astype("int64").reset_index(drop=True)
    triples = unsorted.drop_duplicates()
    perms = {
        name: triples.sort_values(order, kind="stable").reset_index(drop=True)[["s", "p", "o"]]
        for name, order in PERM_ORDERS.items()
    }
    stats = pd.DataFrame(
        [
            {
                "num_triples": len(triples),
                "distinct_subjects": triples["s"].nunique(),
                "distinct_predicates": triples["p"].nunique(),
                "distinct_objects": triples["o"].nunique(),
                "distinct_sp_pairs": len(triples[["s", "p"]].drop_duplicates()),
                "distinct_po_pairs": len(triples[["p", "o"]].drop_duplicates()),
                "distinct_os_pairs": len(triples[["o", "s"]].drop_duplicates()),
            }
        ]
    )
    return {
        "mentions": mentions,
        "canonical_mentions": cm,
        "vocab_s": vs[["term", "id"]],
        "vocab_p": vp[["term", "id"]],
        "vocab_o": vo[["term", "id"]],
        "triples_unsorted": unsorted,
        "triples": triples.sort_values(["s", "p", "o"]).reset_index(drop=True),
        **perms,
        "stats": stats,
    }
