#!/usr/bin/env python3
"""Extract SQL statements from the reference's python test corpus.

AST-based (not regex-over-one-line): walks every string literal in
every test file, so triple-quoted strings, implicit concatenation and
MULTI-LINE f-strings all come out whole — the r15 corpus' ~1.2k
truncated SELECTs were exactly the strings a line-regex cannot see.

f-string holes ({expr}) are filled with deterministic placeholders
chosen by the expression text: name-ish holes (db/tb/col/tag/...)
become identifiers, time-ish holes become an epoch literal, everything
else becomes 1 — so the probe exercises the GRAMMAR; placeholder
column/table resolution failures are expected noise downstream
(ProbeMain maps all tables to events and tallies only parse/lowering
failures).

Usage: python3 tools/extract_corpus.py OUTDIR [select|show|alter|...]
Writes OUTDIR/corpus_<kind>.txt, one statement per line (newlines
inside a statement collapse to spaces).
"""
import ast
import os
import re
import sys

ROOT = "/root/reference/test/cases"
KINDS = ("select", "show", "alter", "create", "insert", "describe",
         "delete", "drop", "explain")

NAMEISH = ("db", "tb", "table", "stb", "ctb", "ntb", "vtb", "name",
           "col", "tag", "func", "view", "topic", "stream", "user",
           "alias", "field", "src", "source", "dnode", "token")
TIMEISH = ("ts", "time", "start", "end", "date", "now")
# duration-string holes (`now - {ms}` where ms = "41m"): a bare number
# placeholder would probe `now - 1`, mis-flagging duration grammar
DURISH = ("ms", "dur", "delay", "step", "gap", "interval",
          "sleep", "period")


def fv_placeholder(expr_src):
    s = re.sub(r"\W", "_", expr_src.lower())
    if any(k in s for k in NAMEISH):
        return "ph_" + (s[:12].strip("_") or "x")
    if set(s.split("_")) & set(DURISH):
        return "1m"
    # column-TYPE holes (`pk {pk_type} primary key`): a numeric
    # placeholder probes `pk 1`, a non-type — use a real type name
    if "type" in s.split("_"):
        return "int"
    # `{keyword} by c1` holes iterate partition/group — either parses;
    # a numeric placeholder probes `… 1 by c1`, which is no grammar
    if "keyword" in s.split("_"):
        return "partition"
    if any(k in s for k in TIMEISH):
        return "1704067200000"
    return "1"


def string_of(node):
    """Literal text of a Constant-str / JoinedStr / implicit-concat
    BinOp(+) tree, or None if any part is not string-like."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.JoinedStr):
        out = []
        for part in node.values:
            if isinstance(part, ast.Constant):
                out.append(str(part.value))
            elif isinstance(part, ast.FormattedValue):
                try:
                    out.append(fv_placeholder(ast.unparse(part.value)))
                except Exception:
                    out.append("1")
        return "".join(out)
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
        a, b = string_of(node.left), string_of(node.right)
        if a is not None and b is not None:
            return a + b
    return None


def fill_templates(txt):
    """%-format and str.format holes get the same placeholder
    treatment as f-string holes."""
    txt = re.sub(r"%[0-9.]*[duif]", "1", txt)
    txt = re.sub(r"%[0-9.]*s", "ph_s", txt)
    txt = re.sub(r"\{([^{}]*)\}", lambda m: fv_placeholder(m.group(1))
                 if m.group(1) else "ph", txt)
    # a hole that was an entire parenthesized FROM source was a nested
    # SQL string (`select * from ({sql})`) — make it a subquery so the
    # probe exercises the OUTER grammar instead of failing on `(1)`
    txt = re.sub(r"(?i)(\bfrom\s*\(\s*)(?:1|ph_s|ph_sql\w*|"
                 r"1704067200000)(\s*\))", r"\1select 1 as c1\2", txt)
    return txt


def is_prose_or_fragment(low):
    """Harness LOG strings that start with a SQL keyword ("insert data
    ............ [OK]", "create topic sql: %s", bare "drop database")
    are not statements — structural tells, kept conservative so no real
    grammar shape can match:
    - INSERT always takes INTO in the dialect (sql.y insert_query)
    - two-token create/drop/alter (verb + kind, no object name) is
      never complete, `if [not] exists` included
    - "create topics" (plural) is never grammar
    - dot-runs, "[ok]", "sql:" are log formatting"""
    if re.search(r"(?:\b(?:from|where|and|or|on|in|as|by|join|"
                 r"select|union|all)|,|\()\s*$", low):
        return True
    if re.search(r"\b(?:the|that|should|verify|verifies|returns|"
                 r"subsequent|correctly|mismatch|expected|returned|"
                 r"includes|rewrites|retains|passed|independently|"
                 r"each|successfully)\b", low):
        return True
    if re.search(r"\.{3,}|\[ok\]|\bsql:", low):
        return True
    # `!` outside `!=`, a colon right after the object kind
    # ("create stream:N"), ", and " conjunctions, and sentences ending
    # in "word." are log/prose shapes no grammar production emits
    if re.search(r"!(?!=)", low) or re.search(r",\s+and\b", low):
        return True
    if re.match(r"(?:create|drop|alter)\s+\w+\s*:", low):
        return True
    if re.search(r"[a-z]\.\s*$", low):
        return True
    if re.search(r"\bsuccess\b", low):
        return True
    if re.match(r"insert\s+(?!into\b)", low):
        return True
    if re.match(r"create\s+(?:topics|super|child|consume)\b", low):
        return True
    # a CREATE STREAM with nothing but a name is a log prefix — the
    # statement form always carries a trigger/INTO/AS tail
    if re.match(r"create\s+stream\s+[\w.]+\s*;?$", low):
        return True
    # "drop one stream", "drop all snode test", "drop consumeinfo
    # table", "... snode test" — log phrasings, not grammar
    if re.match(r"(?:create|drop)\s+(?:one|all|consume\w*)\b", low):
        return True
    if re.search(r"\b(?:snode|stream|table)s?\s+test$", low):
        return True
    # NOT describe: `describe <tb>` is a real two-token statement
    if re.match(r"(?:create|drop|alter|delete|explain)\s+"
                r"[\w.\[\]]+(?:\s+if\s+(?:not\s+)?exists)?\s*;?$", low):
        return True
    # r19 sweep (receipt-adjudicated prose classes; word rules run
    # against literal-masked text so quoted data can't match):
    masked = re.sub(r"'[^']*'", "''", low)
    if re.search(r"\b(?:failed|exception|completed|succeeds|raises|"
                 r"idempotent|re-query|monitor|detial|error)\b", masked):
        return True
    # log suffixes ("create test job: 1", "alter replica ...: 2")
    if re.search(r":\s*\d+\s*$", masked):
        return True
    # privilege-name / user-option constants harvested as statements
    if re.match(r"(?:show|alter)\s+(?:system|audit|security|debug)\s+"
                r"variables?\s*$", low):
        return True
    if re.match(r"drop\s+(?:not_)?allow_", low):
        return True
    # keyword + plain-word sentence with no SQL operand structure
    # ("drop some ntables", "create audit database", "drop columns
    # from output table" has FROM -> kept)
    words = masked.rstrip(";").split()
    if (len(words) >= 3 and
            words[0] in ("create", "drop", "alter", "delete") and
            all(re.fullmatch(r"[a-z][a-z-]*", w) for w in words[1:]) and
            not any(w in ("from", "into", "values", "table", "database",
                          "view", "topic", "stream", "user", "dnode",
                          "snode", "mnode", "qnode", "vnode", "function",
                          "index", "stable", "vtable", "force")
                    for w in words[1:])):
        return True
    return False


def concat_children(tree):
    """ids of nodes that are DESCENDANTS of a string-concat expression
    (BinOp + / JoinedStr): the parent concat is harvested whole (when
    it is all-string), so its pieces must not be harvested again as
    statements — a `"create snode on dnode " + str(x)` left piece is a
    fragment by construction."""
    cov = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr) or (
                isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add)):
            for sub in ast.walk(node):
                if sub is not node:
                    cov.add(id(sub))
    return cov


def balanced(txt):
    """False for source FRAGMENTS (tests concatenate SQL across
    statements): unbalanced single quotes or parens."""
    if txt.count("'") % 2 == 1:
        return False
    depth = 0
    in_str = False
    for ch in txt:
        if in_str:
            in_str = ch != "'"
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


class _ErrScan(ast.NodeVisitor):
    """Strings EXPECTED to fail in the reference: arguments of
    tdSql.error(...)-style calls — inline literals, the common
    `sql = "…"; tdSql.error(sql)` variable indirection (visited in
    source order, so the nearest preceding assignment wins), and the
    list+loop form `sql_list = […]; for sql in sql_list:
    tdSql.error(sql)` (with or without enumerate)."""

    def __init__(self):
        self.env = {}
        self.list_env = {}
        self.err_nodes = set()
        self.err_texts = set()

    def visit_Assign(self, node):
        s = string_of(node.value)
        if s is not None:
            for t in node.targets:
                if isinstance(t, ast.Name):
                    self.env[t.id] = s
        elif isinstance(node.value, (ast.List, ast.Tuple)):
            texts = [string_of(e) for e in node.value.elts]
            if texts and all(t is not None for t in texts):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.list_env[t.id] = texts
        self.generic_visit(node)

    def visit_For(self, node):
        targets = {n.id for n in ast.walk(node.target)
                   if isinstance(n, ast.Name)}
        body_errs_target = any(
            isinstance(c, ast.Call) and isinstance(c.func, ast.Attribute)
            and "error" in c.func.attr.lower() and c.args
            and isinstance(c.args[0], ast.Name)
            and c.args[0].id in targets
            for c in ast.walk(node))
        if body_errs_target:
            it = node.iter
            if (isinstance(it, ast.Call) and isinstance(it.func, ast.Name)
                    and it.func.id == "enumerate" and it.args):
                it = it.args[0]
            texts = []
            if isinstance(it, (ast.List, ast.Tuple)):
                texts = [string_of(e) for e in it.elts]
            elif isinstance(it, ast.Name):
                texts = self.list_env.get(it.id) or []
            for t in texts:
                if t is not None:
                    self.err_texts.add(t)
        self.generic_visit(node)

    def visit_Dict(self, node):
        # data-driven test dicts: {"exception": True, "sql": […]} marks
        # every statement in the entry as an expected error
        is_exc = any(
            isinstance(k, ast.Constant) and k.value == "exception"
            and isinstance(v, ast.Constant) and v.value is True
            for k, v in zip(node.keys, node.values))
        if is_exc:
            for v in node.values:
                for sub in ast.walk(v):
                    s = string_of(sub)
                    if s is not None:
                        self.err_texts.add(s)
        self.generic_visit(node)

    def visit_Call(self, node):
        if (isinstance(node.func, ast.Attribute)
                and "error" in node.func.attr.lower() and node.args):
            a = node.args[0]
            for sub in ast.walk(a):
                self.err_nodes.add(id(sub))
            s = string_of(a)
            if s is None and isinstance(a, ast.Name):
                s = self.env.get(a.id)
            if s is not None:
                self.err_texts.add(s)
        self.generic_visit(node)


def harvest(path, sink, neg):
    try:
        tree = ast.parse(open(path, encoding="utf-8",
                              errors="replace").read())
    except SyntaxError:
        return
    # statements inside tdSql.error(...)-style calls are EXPECTED to
    # fail in the reference — a loud reject on them is correct
    # behavior, not a dialect gap, so they must not count as signal
    scan = _ErrScan()
    scan.visit(tree)
    cov = concat_children(tree)
    for node in ast.walk(tree):
        if id(node) in cov:
            continue
        s = string_of(node)
        if s is None:
            continue
        # differential-fuzz GENERATOR templates (test_in_subq2 /
        # test_scalar_sub2 write these to a queries file for another
        # harness — they are never executed as assertions here)
        if "{scalarSql}" in s or "{funcName}" in s:
            continue
        txt = fill_templates(" ".join(s.split()))
        low = txt.lower()
        if is_prose_or_fragment(low):
            continue
        for kind in KINDS:
            if (low.startswith(kind + " ") and len(txt) > len(kind) + 3
                    and balanced(txt)):
                is_err = (id(node) in scan.err_nodes
                          or s in scan.err_texts)
                (neg if is_err else sink).setdefault(kind, set()).add(txt)
                break


def harvest_stream(path):
    """Per-file statement STREAM: statements in source order (line
    number), expected-error statements excluded — the sequence a test
    actually runs, so creates precede the inserts/selects that target
    them. Returns [] when the file has no statements."""
    try:
        tree = ast.parse(open(path, encoding="utf-8",
                              errors="replace").read())
    except SyntaxError:
        return []
    scan = _ErrScan()
    scan.visit(tree)
    cov = concat_children(tree)
    out = []
    for node in ast.walk(tree):
        if id(node) in cov:
            continue
        s = string_of(node)
        if s is None or "{scalarSql}" in s or "{funcName}" in s:
            continue
        txt = fill_templates(" ".join(s.split()))
        low = txt.lower()
        if is_prose_or_fragment(low):
            continue
        for kind in KINDS:
            if (low.startswith(kind + " ") and len(txt) > len(kind) + 3
                    and balanced(txt)):
                if not (id(node) in scan.err_nodes
                        or s in scan.err_texts):
                    out.append((getattr(node, "lineno", 0), txt))
                break
    out.sort()
    dedup = []
    for _, t in out:
        if not dedup or dedup[-1] != t:
            dedup.append(t)
    return dedup


def main():
    outdir = sys.argv[1]
    args = [a for a in sys.argv[2:] if a != "--streams"]
    streams = "--streams" in sys.argv[2:]
    only = set(args) or set(KINDS)
    os.makedirs(outdir, exist_ok=True)
    if streams:
        n_files, n_stmts = 0, 0
        with open(os.path.join(outdir, "corpus_streams.txt"), "w") as fh:
            for dirpath, _dirs, files in os.walk(ROOT):
                for f in sorted(files):
                    if not f.endswith(".py"):
                        continue
                    path = os.path.join(dirpath, f)
                    stmts = harvest_stream(path)
                    if len(stmts) < 2:
                        continue
                    rel = os.path.relpath(path, ROOT)
                    fh.write(f"##FILE {rel}\n")
                    fh.write("\n".join(stmts) + "\n")
                    n_files += 1
                    n_stmts += len(stmts)
        print(f"streams: {n_stmts} statements across {n_files} files "
              f"-> {outdir}/corpus_streams.txt")
        return
    sink, neg = {}, {}
    n_files = 0
    for dirpath, _dirs, files in os.walk(ROOT):
        for f in files:
            if f.endswith(".py"):
                harvest(os.path.join(dirpath, f), sink, neg)
                n_files += 1
    for kind in sorted(only & set(sink)):
        bad = neg.get(kind, set())
        stmts = sorted(sink[kind] - bad)
        p = os.path.join(outdir, f"corpus_{kind}.txt")
        with open(p, "w") as fh:
            fh.write("\n".join(stmts) + "\n")
        if bad:
            with open(os.path.join(
                    outdir, f"corpus_{kind}_err.txt"), "w") as fh:
                fh.write("\n".join(sorted(bad)) + "\n")
        print(f"{kind:10s} {len(stmts):6d} (+{len(bad)} expected-error)"
              f" -> {p}")
    print(f"scanned {n_files} files")


if __name__ == "__main__":
    main()
