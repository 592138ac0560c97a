"""One-shot mechanical splitter for apollo_spark/queries.py -> queries/ package.

Zero behavior change by construction: modules are contiguous raw-text slices
of the original file (comments preserved), each prefixed with the shared
import block plus GENERATED explicit cross-module imports computed by AST
name analysis; the registry dicts move to __init__.py verbatim. Run once,
verify the gate, then delete this script's output only via git.
"""

from __future__ import annotations

import ast
import builtins
import sys

SRC = "apollo_spark/queries.py"
PKG = "apollo_spark/queries"

# (module_name, first_line, last_line) — 1-based inclusive raw-text slices.
CUTS = [
    ("relational", 94, 719),
    ("events", 720, 1464),
    ("text_dedup", 1465, 2583),
    ("corpus", 2584, 3803),
    ("media", 3804, 4014),
    ("curation", 4015, 5048),
    ("analytics", 5049, 6200),
    ("longtail", 6201, 8393),
    ("mining", 8403, 9786),
]

BASE_IMPORTS = """from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import carry_caches, scoped_persist
from apollo_spark.ops.dedup import exact_dedup, minhash_lsh_pairs
from apollo_spark.ops.relational import asof_join
from apollo_spark.ops.similarity import cosine
from apollo_spark.ops.text import STOPWORDS, fingerprint, language_id, quality_score, token_count
"""

BASE_NAMES = {
    "annotations", "Callable", "DataFrame", "SparkSession", "Window", "F",
    "carry_caches", "scoped_persist", "exact_dedup", "minhash_lsh_pairs",
    "asof_join", "cosine", "STOPWORDS", "fingerprint", "language_id",
    "quality_score", "token_count",
}

MODULE_DOC = {
    "relational": "TPC-H-flavored relational tier.",
    "events": "Events tier: apollo-semantics DSL queries + time-series ops.",
    "text_dedup": "LLM-data tier, first wave: dedup / text analysis / similarity; window & set-op tier.",
    "corpus": "LLM tier continued: quality scoring, search, classifiers, graph walks, near-dup, lattice ANN/SemDeDup.",
    "media": "Multimodal tier: image feature extraction (PPM/PNG/GIF/JPEG codecs), aHash near-dup.",
    "curation": "Corpus curation tier: sampling, ordering, decontamination, PII, BPE; additional TPC-H shapes.",
    "analytics": "Sketches (HLL/theta/CMS/bloom), training mixtures, product analytics, Z-order, k-means/PQ/MMR, graph structure.",
    "longtail": "Assorted tier: quantiles, sessionization, regression, time-series search, profiles, histograms.",
    "mining": "Round-6/7 waves: linkage, web curation, mining, privacy, blocking evaluation, EVM raw surface + cross-chain DSL.",
}


def top_level_defs(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if isinstance(node.target, ast.Name):
                names.add(node.target.id)
        elif isinstance(node, ast.For):
            for n in ast.walk(node.target):
                if isinstance(n, ast.Name):
                    names.add(n.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
    return names


def loaded_names(tree: ast.Module) -> set[str]:
    return {n.id for n in ast.walk(tree) if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)}


def bound_anywhere(tree: ast.Module) -> set[str]:
    """Every name bound ANYWHERE (params, locals, comprehension vars...) —
    used to filter the overapproximated load set down to true globals."""
    names: set[str] = set()
    for n in ast.walk(tree):
        if isinstance(n, ast.Name) and isinstance(n.ctx, (ast.Store, ast.Del)):
            names.add(n.id)
        elif isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(n.name)
        elif isinstance(n, ast.arg):
            names.add(n.arg)
        elif isinstance(n, ast.alias):
            names.add((n.asname or n.name).split(".")[0])
        elif isinstance(n, (ast.Global, ast.Nonlocal)):
            names.update(n.names)
    return names


def main() -> None:
    lines = open(SRC).read().splitlines(keepends=True)

    def slice_(a: int, b: int) -> str:
        return "".join(lines[a - 1 : b])

    mod_src = {name: slice_(a, b) for name, a, b in CUTS}
    shared_src = slice_(1, 93)
    init_tail = slice_(8394, 8402) + slice_(9787, len(lines))

    # where is each top-level name defined?
    defined_in: dict[str, str] = {}
    for name in ("_shared",) + tuple(m for m, _, _ in CUTS):
        src = shared_src if name == "_shared" else mod_src[name]
        for d in top_level_defs(ast.parse(src)):
            defined_in.setdefault(d, name)

    order = ["_shared"] + [m for m, _, _ in CUTS]
    bi = set(dir(builtins)) | BASE_NAMES

    problems = []
    out_files = {}
    for i, name in enumerate(order):
        if name == "_shared":
            out_files["_shared.py"] = shared_src
            continue
        src = mod_src[name]
        tree = ast.parse(src)
        mine = top_level_defs(tree)
        needed = loaded_names(tree) - bound_anywhere(tree) - mine - bi
        imports: dict[str, list[str]] = {}
        for n in sorted(needed):
            home = defined_in.get(n)
            if home is None or home == name:
                problems.append(f"{name}: unresolved global {n!r}")
                continue
            if order.index(home) > i:
                problems.append(f"{name}: FORWARD dep on {home}.{n}")
            imports.setdefault(home, []).append(n)
        header = f'"""{MODULE_DOC[name]}\n\nMechanically split from the single-file registry (round 8); content unchanged.\n"""\n\n' + BASE_IMPORTS
        for home in sorted(imports, key=order.index):
            header += f"from apollo_spark.queries.{home} import {', '.join(imports[home])}\n"
        out_files[name + ".py"] = header + "\n\n" + src

    # __init__: registry dicts + explicit imports of every name they reference
    tree = ast.parse(init_tail)
    needed = loaded_names(tree) - bound_anywhere(tree) - top_level_defs(tree) - set(dir(builtins)) - {"Callable", "DataFrame", "SparkSession"}
    imports = {}
    for n in sorted(needed):
        home = defined_in.get(n)
        if home is None:
            problems.append(f"__init__: unresolved global {n!r}")
            continue
        imports.setdefault(home, []).append(n)
    doc = shared_src.split('"""')[1]
    header = f'"""{doc}"""\n\nfrom __future__ import annotations\n\nfrom typing import Callable\n\nfrom pyspark.sql import DataFrame, SparkSession\n\n'
    # names external consumers import from apollo_spark.queries but the
    # registry itself never references
    extra = {"_shared": ["_events", "_t", "normalize_ts_nanos", "dsum", "davg"],
             "corpus": ["semdedup_k"]}
    for home, names in extra.items():
        imports.setdefault(home, [])
        for n in names:
            if n not in imports[home]:
                imports[home].append(n)
    for home in sorted(imports, key=order.index):
        block = ",\n    ".join(sorted(set(imports[home])))
        header += f"from apollo_spark.queries.{home} import (\n    {block},\n)\n"
    out_files["__init__.py"] = header + "\n" + init_tail

    if problems:
        print("PROBLEMS:\n" + "\n".join(problems))
        sys.exit(1)

    import os
    os.makedirs(PKG, exist_ok=True)
    for fn, content in out_files.items():
        with open(f"{PKG}/{fn}", "w") as f:
            f.write(content)
        print(f"wrote {PKG}/{fn}: {content.count(chr(10))} lines")
    os.remove(SRC)
    print("removed", SRC)


if __name__ == "__main__":
    main()
