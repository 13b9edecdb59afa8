"""Deterministic synthetic source-code corpus + gold fixtures (seed 42).

Generates, in pure Python (no Spark dependency, so the gold path is an
independent implementation from the pipeline):

- ``corpus`` rows  — (repo, path, commit, lang, content, content_sha256),
  the exact input shape of BASELINE.json ``input_hint``; includes one
  mega-repo holding ~30% of files to exercise skew salting (FIXTURES.md §1);
- ``mentions_gold`` rows — planted entity spans with char offsets satisfying
  the reference's core invariant ``content[start:end] == surface``
  (step_process_to_document.py:110);
- ``triples_gold`` rows — the (subj, pred, obj) targets (P/R >= 0.95 gate),
  with canonicalization clusters computed by an independent union-find;
- ``anchors`` — pinned per-type golden mentions, mirroring
  /root/reference/contrastive/fewnerd_processor.py:155-199.

Surface-form variant chains (case / underscore-squash, >=3 hops) are planted
so canonicalization requires *iterative* label propagation, per FIXTURES.md §4.
"""

from __future__ import annotations

import hashlib
import random
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


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def mention_id(repo: str, path: str, commit: str, start: int, end: int, surface: str) -> str:
    """fnd_ + sha1 over identity fields — scheme of step_index_to_database.py:36-39."""
    return "fnd_" + _sha1("".join([repo, path, commit, str(start), str(end), surface]))


# --- canonicalization keys: MUST match nerzo_spark/functions/text.py ---------

def norm_key(surface: str) -> str:
    """Python twin of functions.text.normalize_surface (key #1)."""
    import re

    x = surface.lower()
    x = re.sub(r"[`'\"]", "", x)
    x = re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", x)
    x = re.sub(r"\s+", " ", x)
    return x


def squash(surface: str) -> str:
    """Python twin of functions.text.squash_key (key #2)."""
    import re

    return re.sub(r"[_.\- ]", "", norm_key(surface))


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


def _entity_line(rng: random.Random, fine: str, surface: str) -> tuple[str, int]:
    """Render the line containing `surface`; return (line, offset-of-surface)."""
    if fine == "function":
        pre = "def "
        return f"{pre}{surface}(ctx):", len(pre)
    if fine == "class":
        pre = "class "
        return f"{pre}{surface}:", len(pre)
    if fine == "constant":
        return f"{surface} = {rng.randint(1, 999)}", 0
    if fine == "import":
        pre = "import "
        return f"{pre}{surface}", len(pre)
    if fine == "email":
        pre = "# contact "
        return f"{pre}{surface} for access", len(pre)
    if fine == "http_url":
        pre = "# see "
        return f"{pre}{surface}", len(pre)
    if fine == "ipv4":
        pre = 'host = "'
        return f'{pre}{surface}"', len(pre)
    if fine == "semver":
        pre = "# requires pkg "
        return f"{pre}{surface}", len(pre)
    raise ValueError(fine)


def _filler_line(rng: random.Random) -> str:
    n = rng.randint(3, 9)
    return " ".join(rng.choice(FILLER) for _ in range(n))


def _variant_chain(base_a: str, base_b: str) -> list[str]:
    """4 surface forms, >=3 hops through key#1/key#2 buckets:
    Snake_Case -k1- snake_case -k2- squashed -k1- CamelCase."""
    snake = f"{base_a}_{base_b}"
    return [
        snake,
        f"{base_a.capitalize()}_{base_b.capitalize()}",
        f"{base_a}{base_b}",
        f"{base_a.capitalize()}{base_b.capitalize()}",
    ]


@dataclass
class Fixture:
    corpus: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    triples: list[dict] = field(default_factory=list)
    anchors: list[dict] = field(default_factory=list)


def generate(n_files: int = 120, seed: int = SEED, mega_repo_frac: float = 0.3,
             n_variant_chains: int = 6) -> Fixture:
    rng = random.Random(seed)
    fx = Fixture()
    fine_types = list(FINE_TO_COARSE.keys())

    # pre-plan variant-chain plantings: (surface, fine) spread over files
    chain_plants: list[str] = []
    used = set()
    for _ in range(n_variant_chains):
        while True:
            a, b = rng.choice(NAME_WORDS), rng.choice(NAME_WORDS)
            if a != b and (a, b) not in used:
                used.add((a, b))
                break
        chain_plants.extend(_variant_chain(a, b))

    plant_queue = list(chain_plants)
    rng.shuffle(plant_queue)

    n_mega = int(n_files * mega_repo_frac)
    for i in range(n_files):
        if i < n_mega:
            repo = "org0/megarepo"  # skew: ~30% of files in one repo
        else:
            repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/m{i % 13}/file{i}.{ {'python':'py','java':'java','go':'go','js':'js','md':'md'}[lang] }"
        commit = _sha1(f"{repo}|{path}")  # 40-hex, deterministic from (repo, path)

        lines: list[str] = []
        planted: list[tuple[int, str, str]] = []  # (line_idx, fine, surface)
        n_ent = rng.randint(2, 6)
        for _ in range(rng.randint(1, 3)):
            lines.append(_filler_line(rng))
        for _ in range(n_ent):
            if plant_queue and rng.random() < 0.25:
                surface = plant_queue.pop()
                fine = "function"
            else:
                fine = rng.choice(fine_types)
                surface = _gen_surface(rng, fine)
            line, off = _entity_line(rng, fine, surface)
            planted.append((len(lines), fine, surface))
            lines.append(line)
            for _ in range(rng.randint(1, 3)):
                lines.append(_filler_line(rng))

        content = "\n".join(lines)
        fx.corpus.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
                "content_sha256": sha256_hex(content),
            }
        )

        # gold mentions with exact char offsets
        line_starts = []
        pos = 0
        for ln in lines:
            line_starts.append(pos)
            pos += len(ln) + 1
        for line_idx, fine, surface in planted:
            start_in_line = lines[line_idx].find(surface)
            assert start_in_line >= 0
            start = line_starts[line_idx] + start_in_line
            end = start + len(surface)
            assert content[start:end] == surface  # reference invariant :110
            fx.mentions.append(
                {
                    "mention_id": mention_id(repo, path, commit, start, end, surface),
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "span_start": start,
                    "span_end": end,
                    "surface": surface,
                    "coarse_type": FINE_TO_COARSE[fine],
                    "fine_type": fine,
                    "text_id": _sha1(content),
                }
            )

    _build_gold_triples(fx)
    _build_anchors(fx, rng)
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
        for key in (("k1", norm_key(s)), ("k2", squash(s))):
            buckets.setdefault((ft, key[0] + ":" + key[1]), []).append((ft, s))
    for members in buckets.values():
        for other in members[1:]:
            union(members[0], other)

    canonical: dict[tuple[str, str], str] = {}
    cluster_min: dict[tuple[str, str], str] = {}
    for p in pairs:
        r = find(p)
        k1 = norm_key(p[1])
        if r not in cluster_min or k1 < cluster_min[r]:
            cluster_min[r] = k1
    for p in pairs:
        canonical[p] = cluster_min[find(p)]

    def ent_id(fine: str, canon: str) -> str:
        return "ent_" + _sha1(f"{fine}|{canon}")

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
        dict(zip(["subj", "pred", "obj", "repo", "path", "commit"], t)) for t in sorted(
            triples, key=lambda t: (t[0], t[1], t[2])
        )
    ]


def _build_anchors(fx: Fixture, rng: random.Random, per_type: int = 8) -> None:
    """Pinned golden mentions per fine type (fewnerd_processor.py:155-199 analog).
    Deterministic: the `per_type` smallest mention_ids of each type."""
    by_type: dict[str, list[dict]] = {}
    for m in fx.mentions:
        by_type.setdefault(m["fine_type"], []).append(m)
    for fine, ms in sorted(by_type.items()):
        ms_sorted = sorted(ms, key=lambda m: m["mention_id"])
        seen_surfaces = set()
        picked = []
        for m in ms_sorted:
            if m["surface"] not in seen_surfaces:
                picked.append(m)
                seen_surfaces.add(m["surface"])
            if len(picked) >= per_type:
                break
        for m in picked:
            fx.anchors.append({"fine_type": fine, "mention_id": m["mention_id"]})
