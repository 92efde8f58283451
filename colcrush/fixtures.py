"""Deterministic synthetic fixtures (FIXTURES.md F1-F5). No external data.

Every field is a pure function of the row id (multiplicative hashing +
inverse-CDF transforms), so generation is order- and partitioning-
independent: the same id yields the same row whether generated on 1 or
1000 executors. This mirrors the reference's fixture discipline
(/root/reference/core/src/it/scala/com/github/mjakubowski84/parquet4s/CompatibilityTestCases.scala:12-113)
while staying fully vectorized for scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

SEED = 42

LANGS = np.array(
    ["python", "scala", "java", "go", "rust", "js", "md", "yaml", "txt", "c"]
)
# skewed frequencies (RLE-friendly once sorted)
LANG_WEIGHTS = np.array([0.28, 0.16, 0.14, 0.10, 0.08, 0.08, 0.06, 0.04, 0.03, 0.03])
EXT = {
    "python": "py", "scala": "scala", "java": "java", "go": "go", "rust": "rs",
    "js": "js", "md": "md", "yaml": "yaml", "txt": "txt", "c": "c",
}
DIR_VOCAB = np.array(
    ["src", "lib", "tests", "pkg", "internal", "app", "core", "util", "api", "cmd"]
)
STEM_VOCAB = np.array(
    ["main", "utils", "handler", "model", "config", "server", "client",
     "parser", "codec", "index"]
)

_TEMPLATES = {
    "python": "import os\nimport sys\n\n\ndef {stem}_{k}(arg_{k}, ctx):\n    \"\"\"Handle {stem} request {k}.\"\"\"\n    value = ctx.get('key_{k}', {num})\n    return os.path.join(str(arg_{k}), str(value))\n\n",
    "scala": "package {stem}\n\nobject Handler{k} {{\n  def apply(arg: Int): Int = {{\n    val value = arg + {num}\n    value * 2\n  }}\n}}\n\n",
    "java": "package com.example.{stem};\n\npublic class Handler{k} {{\n    private static final int VALUE = {num};\n    public int apply(int arg) {{ return arg + VALUE; }}\n}}\n\n",
    "go": "package {stem}\n\nimport \"fmt\"\n\nfunc Handler{k}(arg int) string {{\n\treturn fmt.Sprintf(\"%d\", arg+{num})\n}}\n\n",
    "rust": "pub fn handler_{k}(arg: i64) -> i64 {{\n    let value: i64 = {num};\n    arg + value\n}}\n\n",
    "js": "export function handler{k}(arg) {{\n  const value = {num};\n  return arg + value;\n}}\n\n",
    "md": "# Section {k}\n\nThe {stem} module handles case {num}. See also section {k}.\n\n- item one\n- item two\n\n",
    "yaml": "service_{k}:\n  name: {stem}\n  replicas: {num}\n  enabled: true\n",
    "txt": "Note {k}: the {stem} process completed with status {num}.\n",
    "c": "#include <stdio.h>\n\nstatic int handler_{k}(int arg) {{\n    int value = {num};\n    return arg + value;\n}}\n\n",
}
_HEADER = {
    lang: f"/* colcrush fixture — {lang} boilerplate header, Apache-2.0 */\n"
    for lang in _TEMPLATES
}

_DUP_CONTENT = "def shared():\n    # exact duplicate across repos\n    return 42\n"
_UNICODE_CONTENT = "def ünïcode_λ():\n    π = 3.14159\n    return '中文注释'\n"


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style deterministic hash of ids (uint64)."""
    z = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15 * (salt + 1) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    return _mix(ids, salt).astype(np.float64) / float(2**64)


def _zipf_cdf(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


def source_code_batch(
    ids: np.ndarray,
    n_repos: int = 50,
    content_scale: float = 1.0,
) -> pa.RecordBatch:
    """Generate F1 rows for the given ids -> arrow batch
    (repo, path, commit, lang, content)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    uids = ids.astype(np.uint64)

    # repo: Zipf(s=1.2) over n_repos -> one mega-repo dominates (skew)
    repo_idx = np.searchsorted(_zipf_cdf(n_repos), _uniform(uids, 1))
    repo_idx = np.minimum(repo_idx, n_repos - 1)

    # lang: skewed categorical
    lang_idx = np.searchsorted(np.cumsum(LANG_WEIGHTS), _uniform(uids, 2))
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)
    langs = LANGS[lang_idx]

    # commit: 1..20 distinct per repo, heavily repeated
    commits_per_repo = 1 + (_mix(np.arange(n_repos, dtype=np.uint64), 4) % np.uint64(20))
    commit_k = (_mix(uids, 5) % commits_per_repo[repo_idx]).astype(np.int64)

    # path: 1-6 dirs from vocab + stem + ext(lang); shared prefixes
    depth = 1 + (_mix(uids, 6) % np.uint64(6)).astype(np.int64)
    d1 = DIR_VOCAB[(_mix(uids, 7) % np.uint64(len(DIR_VOCAB))).astype(np.int64)]
    d2 = DIR_VOCAB[(_mix(uids, 8) % np.uint64(len(DIR_VOCAB))).astype(np.int64)]
    stem = STEM_VOCAB[(_mix(uids, 9) % np.uint64(len(STEM_VOCAB))).astype(np.int64)]
    file_no = (_mix(uids, 10) % np.uint64(100)).astype(np.int64)

    # content length: log-normal, median ~2 KiB * content_scale
    z = np.sqrt(-2.0 * np.log(np.clip(_uniform(uids, 11), 1e-12, 1.0))) * np.cos(
        2 * np.pi * _uniform(uids, 12)
    )
    target_len = np.clip(
        np.exp(np.log(2048.0 * content_scale) + 0.9 * z), 16, 65536 * content_scale
    ).astype(np.int64)
    num = (_mix(uids, 13) % np.uint64(100000)).astype(np.int64)
    kvar = (_mix(uids, 14) % np.uint64(50)).astype(np.int64)

    # assemble per row (strings are inherently per-row; keep ops cheap)
    repo_names = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)])
    commit_cache: dict[tuple[int, int], str] = {}
    repos, paths, commits, contents = [], [], [], []
    for j in range(n):
        i = int(ids[j])
        r = int(repo_idx[j])
        lang = str(langs[j])
        repos.append(repo_names[r])
        parts = [str(d1[j])]
        if depth[j] >= 3:
            parts.append(str(d2[j]))
        if depth[j] >= 5:
            parts.append(str(stem[j]))
        parts.append(f"{stem[j]}_{file_no[j]}.{EXT[lang]}")
        paths.append("/".join(parts))
        ck = (r, int(commit_k[j]))
        c = commit_cache.get(ck)
        if c is None:
            c = hashlib.sha1(f"{repo_names[r]}:{ck[1]}".encode()).hexdigest()
            commit_cache[ck] = c
        commits.append(c)

        # edge rows by absolute id (FIXTURES.md F1)
        if i == 0:
            contents.append("")
            continue
        if i == 1:
            contents.append("x")
            continue
        if i in (2, 3):
            contents.append(_DUP_CONTENT)
            continue
        if i == 4:
            contents.append(_UNICODE_CONTENT)
            continue
        if i == 5:
            contents.append("y" * 8192)  # very long single line
            continue
        # realistic file body: many *different* functions sharing the
        # language's boilerplate structure (cross-file repetition for the
        # symbol table, no verbatim within-file duplication)
        tmpl = _TEMPLATES[lang]
        st = str(stem[j])
        k0, n0 = int(kvar[j]), int(num[j])
        probe = tmpl.format(stem=st, k=k0, num=n0)
        reps = max(1, int(target_len[j]) // max(1, len(probe)))
        parts_body = [_HEADER[lang]]
        for r in range(reps):
            parts_body.append(
                tmpl.format(stem=st, k=(k0 + r) % 97, num=(n0 + 17 * r) % 100000)
            )
        contents.append("".join(parts_body))

    return pa.record_batch(
        [
            pa.array(repos, type=pa.string()),
            pa.array(paths, type=pa.string()),
            pa.array(commits, type=pa.string()),
            pa.array(langs.tolist(), type=pa.string()),
            pa.array(contents, type=pa.string()),
        ],
        names=["repo", "path", "commit", "lang", "content"],
    )


SOURCE_CODE_DDL = "repo string, path string, commit string, lang string, content string"


def source_code_df(spark, n_rows: int, n_repos: int = 50, content_scale: float = 1.0):
    """Distributed deterministic F1 table as a Spark DataFrame."""
    def gen(it):
        for batch in it:
            ids = batch.column(0).to_numpy()
            yield source_code_batch(ids, n_repos=n_repos, content_scale=content_scale)

    return spark.range(n_rows).mapInArrow(gen, SOURCE_CODE_DDL)


def source_code_table(n_rows: int, n_repos: int = 50, content_scale: float = 1.0) -> pa.Table:
    """Local (driver-side) F1 table for kernel tests."""
    return pa.Table.from_batches(
        [source_code_batch(np.arange(n_rows), n_repos, content_scale)]
    )
