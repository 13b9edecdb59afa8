"""Deterministic synthetic source-code corpus + gold fixtures (seed 42).

Per-file generation is a PURE function of (file index, n_files, seed) —
``gen_file`` — so the corpus can be produced two ways with identical rows:

- driver-side (``generate``) for tests: also builds gold mentions, gold
  triples (independent union-find canonicalization) and pinned anchors;
- distributed (``fixtures.distributed.corpus_df_distributed``): mapInPandas
  over ``spark.range(n_files)`` — no driver bottleneck, benchable at 10^5+
  files, the miniature of generating over an Iceberg snapshot.

Corpus shape is BASELINE.json ``input_hint``: (repo, path, commit, lang,
content, content_sha256), with one mega-repo holding ~30% of files
(FIXTURES.md §1, skew exerciser).  Planted spans satisfy the reference's
invariant ``content[start:end] == surface`` (step_process_to_document.py:110).

Surface-form variant chains (Snake_Case -k1- snake_case -k2- squashed -k1-
CamelCase, >=3 hops) are planted across files so canonicalization requires
iterative label propagation (FIXTURES.md §4).
"""

from __future__ import annotations

import hashlib
import random
import re
from dataclasses import dataclass, field

from nerzo_spark.fixtures.labels import FINE_TO_COARSE, label_id

SEED = 42

FILLER = (
    "the quick value of a stream is computed from rows and batches "
    "while the plan keeps columns sorted for every scan and merge "
    "with small buffers that hold data near the worker"
).split()

NAME_WORDS = [
    "parse", "config", "load", "table", "merge", "batch", "index", "vector",
    "query", "plan", "scan", "shard", "token", "span", "link", "graph",
    "entity", "label", "score", "cache",
]

DOMAINS = ["gmail", "corpdata", "sparkmail", "graphhub", "nerzo"]

LANGS = ["python", "java", "go", "js", "md"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "md": "md"}

MEGA_REPO_FRAC = 0.3
N_VARIANT_CHAINS = 6

# context-window sizes; must match operators/spans.py (LEFT_CTX/RIGHT_CTX)
CTX_LEFT = 16
CTX_RIGHT = 8


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def mention_id(repo: str, path: str, commit: str, start: int, end: int, surface: str) -> str:
    """fnd_ + sha1 over identity fields — scheme of step_index_to_database.py:36-39."""
    return "fnd_" + _sha1("".join([repo, path, commit, str(start), str(end), surface]))


# canonicalization keys live in functions/text.py (one source of truth)
from nerzo_spark.functions.text import norm_key, squash  # noqa: E402,F401


# --- surface + context generators per fine type ------------------------------

def _gen_surface(rng: random.Random, fine: str) -> str:
    w = lambda: rng.choice(NAME_WORDS)
    if fine == "function":
        return f"{w()}_{w()}"
    if fine == "class":
        return f"{w().capitalize()}{w().capitalize()}"
    if fine == "constant":
        return f"{w()}_{w()}".upper()
    if fine == "import":
        return f"{w()}.{w()}"
    if fine == "email":
        return f"{w()}.{w()}@{rng.choice(DOMAINS)}.com"
    if fine == "http_url":
        return f"https://{rng.choice(DOMAINS)}.io/{w()}/{w()}"
    if fine == "ipv4":
        return f"10.{rng.randint(0, 254)}.{rng.randint(0, 254)}.{rng.randint(1, 254)}"
    if fine == "semver":
        return f"{rng.randint(0, 9)}.{rng.randint(0, 20)}.{rng.randint(0, 99)}"
    raise ValueError(fine)


def _entity_line(rng: random.Random, fine: str, surface: str) -> str:
    if fine == "function":
        return f"def {surface}(ctx):"
    if fine == "class":
        return f"class {surface}:"
    if fine == "constant":
        return f"{surface} = {rng.randint(1, 999)}"
    if fine == "import":
        return f"import {surface}"
    if fine == "email":
        return f"# contact {surface} for access"
    if fine == "http_url":
        return f"# see {surface}"
    if fine == "ipv4":
        return f'host = "{surface}"'
    if fine == "semver":
        return f"# requires pkg {surface}"
    raise ValueError(fine)


def _filler_line(rng: random.Random) -> str:
    n = rng.randint(3, 9)
    return " ".join(rng.choice(FILLER) for _ in range(n))


def _variant_chain(base_a: str, base_b: str) -> list[str]:
    snake = f"{base_a}_{base_b}"
    return [
        snake,
        f"{base_a.capitalize()}_{base_b.capitalize()}",
        f"{base_a}{base_b}",
        f"{base_a.capitalize()}{base_b.capitalize()}",
    ]


def _chain_plants(n_files: int, seed: int) -> dict[int, list[str]]:
    """Pure assignment of variant-chain surfaces to file indices."""
    rng = random.Random(f"{seed}|chains")
    out: dict[int, list[str]] = {}
    used: set[tuple[str, str]] = set()
    for c in range(N_VARIANT_CHAINS):
        while True:
            a, b = rng.choice(NAME_WORDS), rng.choice(NAME_WORDS)
            if a != b and (a, b) not in used:
                used.add((a, b))
                break
        for j, surface in enumerate(_variant_chain(a, b)):
            idx = (c * 97 + j * 31 + seed) % n_files
            out.setdefault(idx, []).append(surface)
    return out


def gen_file(i: int, n_files: int, seed: int = SEED,
             chain_plants: dict[int, list[str]] | None = None
             ) -> tuple[dict, list[dict]]:
    """Pure per-file generator -> (corpus_row, gold_mention_rows)."""
    if chain_plants is None:
        chain_plants = _chain_plants(n_files, seed)
    rng = random.Random(f"{seed}|file|{i}")
    fine_types = list(FINE_TO_COARSE.keys())

    n_mega = int(n_files * MEGA_REPO_FRAC)
    repo = "org0/megarepo" if i < n_mega else f"org{i % 7}/repo{i % 23}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/m{i % 13}/file{i}.{_EXT[lang]}"
    commit = _sha1(f"{repo}|{path}")

    lines: list[str] = []
    planted: list[tuple[int, str, str]] = []
    for _ in range(rng.randint(1, 3)):
        lines.append(_filler_line(rng))
    extra = list(chain_plants.get(i, []))
    n_ent = rng.randint(2, 6) + len(extra)
    for _ in range(n_ent):
        if extra:
            surface = extra.pop()
            fine = "function"
        else:
            fine = rng.choice(fine_types)
            surface = _gen_surface(rng, fine)
        line = _entity_line(rng, fine, surface)
        planted.append((len(lines), fine, surface))
        lines.append(line)
        for _ in range(rng.randint(1, 3)):
            lines.append(_filler_line(rng))

    content = "\n".join(lines)
    corpus_row = {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_sha256": sha256_hex(content),
    }

    line_starts: list[int] = []
    pos = 0
    for ln in lines:
        line_starts.append(pos)
        pos += len(ln) + 1
    text_id = _sha1(content)
    mentions: list[dict] = []
    for line_idx, fine, surface in planted:
        start_in_line = lines[line_idx].find(surface)
        assert start_in_line >= 0
        start = line_starts[line_idx] + start_in_line
        end = start + len(surface)
        assert content[start:end] == surface  # reference invariant :110
        mentions.append(
            {
                "mention_id": mention_id(repo, path, commit, start, end, surface),
                "repo": repo,
                "path": path,
                "commit": commit,
                "span_start": start,
                "span_end": end,
                "surface": surface,
                "left_ctx": content[max(0, start - CTX_LEFT):start],
                "right_ctx": content[end:end + CTX_RIGHT],
                "coarse_type": FINE_TO_COARSE[fine],
                "fine_type": fine,
                "text_id": text_id,
            }
        )
    return corpus_row, mentions


@dataclass
class Fixture:
    corpus: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    triples: list[dict] = field(default_factory=list)
    anchors: list[dict] = field(default_factory=list)
    entities: list[dict] = field(default_factory=list)


def generate(n_files: int = 120, seed: int = SEED) -> Fixture:
    """Driver-side generation incl. gold triples + anchors (test scale)."""
    fx = Fixture()
    plants = _chain_plants(n_files, seed)
    for i in range(n_files):
        corpus_row, mentions = gen_file(i, n_files, seed, plants)
        fx.corpus.append(corpus_row)
        fx.mentions.extend(mentions)
    _build_gold_triples(fx)
    _build_anchors(fx)
    return fx


def _build_gold_triples(fx: Fixture) -> None:
    """Independent (pure-Python union-find) canonicalization -> gold triples."""
    pairs = sorted({(m["fine_type"], m["surface"]) for m in fx.mentions})
    parent: dict[tuple[str, str], tuple[str, str]] = {p: p for p in pairs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    buckets: dict[tuple[str, str], list[tuple[str, str]]] = {}
    for ft, s in pairs:
        for kname, key in (("k1", norm_key(s)), ("k2", squash(s))):
            buckets.setdefault((ft, f"{kname}:{key}"), []).append((ft, s))
    for members in buckets.values():
        for other in members[1:]:
            union(members[0], other)

    cluster_min: dict[tuple[str, str], str] = {}
    for p in pairs:
        r = find(p)
        k1 = norm_key(p[1])
        if r not in cluster_min or k1 < cluster_min[r]:
            cluster_min[r] = k1
    canonical = {p: cluster_min[find(p)] for p in pairs}

    def ent_id(fine: str, canon: str) -> str:
        return "ent_" + _sha1(f"{fine}|{canon}")

    fx.entities = [
        {
            "fine_type": ft,
            "surface": s,
            "canonical": canonical[(ft, s)],
            "entity_id": ent_id(ft, canonical[(ft, s)]),
        }
        for ft, s in pairs
    ]

    triples: set[tuple] = set()
    for m in fx.mentions:
        fine = m["fine_type"]
        coarse = m["coarse_type"]
        eid = ent_id(fine, canonical[(fine, m["surface"])])
        lid = label_id(coarse, fine)
        prov = f"{m['repo']}/{m['path']}@{m['commit']}"
        triples.add((m["mention_id"], "links_to", eid, m["repo"], m["path"], m["commit"]))
        triples.add((eid, "typed_as", lid, None, None, None))
        triples.add((eid, "defined_in", prov, m["repo"], m["path"], m["commit"]))
        triples.add((fine, "subtype_of", coarse, None, None, None))
    fx.triples = [
        dict(zip(["subj", "pred", "obj", "repo", "path", "commit"], t))
        for t in sorted(triples, key=lambda t: (t[0], t[1], t[2]))
    ]


def anchor_rows_for(
    n_files: int, seed: int = SEED, scan_files: int = 1000, per_type: int = 8
) -> list[dict]:
    """Anchor fixture for a corpus of `n_files` WITHOUT generating it all:
    scan only the first `scan_files` files (mention ids depend on n_files,
    so gen_file must be called with the real n_files).  Anchors are pinned
    golden mentions — any deterministic per-type subset qualifies."""
    plants = _chain_plants(n_files, seed)
    fx = Fixture()
    for i in range(min(scan_files, n_files)):
        _, ms = gen_file(i, n_files, seed, plants)
        fx.mentions.extend(ms)
    _build_anchors(fx, per_type=per_type)
    return fx.anchors


def _build_anchors(fx: Fixture, per_type: int = 8) -> None:
    """Pinned golden mentions per fine type (fewnerd_processor.py:155-199
    analog): the `per_type` smallest mention_ids with distinct surfaces.
    Anchors carry (surface, contexts) so the label catalog can be built
    driver-side without scanning the corpus (the reference's get-by-id
    point lookup, dataset_provider.py:175-177)."""
    by_type: dict[str, list[dict]] = {}
    for m in fx.mentions:
        by_type.setdefault(m["fine_type"], []).append(m)
    for fine, ms in sorted(by_type.items()):
        seen: set[str] = set()
        picked = []
        for m in sorted(ms, key=lambda m: m["mention_id"]):
            if m["surface"] not in seen:
                picked.append(m)
                seen.add(m["surface"])
            if len(picked) >= per_type:
                break
        for m in picked:
            fx.anchors.append(
                {
                    "fine_type": fine,
                    "mention_id": m["mention_id"],
                    "surface": m["surface"],
                    "left_ctx": m["left_ctx"],
                    "right_ctx": m["right_ctx"],
                }
            )
