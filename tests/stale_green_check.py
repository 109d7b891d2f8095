"""Stale-green guard — machine-derive the next rotation's re-queue list.

A driver verdict pins a query's RESULT at the git state the driver ran
against. If code the query's implementation actually reaches changes
afterwards, the verdict no longer covers HEAD — the query is STALE-GREEN
and should be re-verified (VERDICT r6 #5; the round-7 ``ivf_assign``
situation, where a shared helper was rewritten in r5/r6 after its
callers' r3/r4 verdicts, was caught by a hand audit — this script makes
that audit mechanical).

Method — SYMBOL-level reachability, not file-level (a new query appended
to a shared pack file must not flag its 40 neighbours):
  1. name -> latest verdict round, from CORRECTNESS_r*.json;
  2. round -> verified git state: the driver records a round's verdicts
     against that round's FINAL head = the first parent of the "round N"
     commit that ADDED CORRECTNESS_r{N}.json;
  3. name -> reachable symbols: starting from the registered function,
     walk every referenced top-level def/class/constant in its module
     and follow package-internal imports into other modules' symbols
     (static ``ast`` analysis — no execution; over-approximates on name
     shadowing, never under-approximates on direct references);
  4. a symbol counts as CHANGED iff its docstring-stripped AST dump
     differs between the verified state and the working tree — comment
     and docstring edits never flag; any code change does (even if the
     local oracle still passes: "locally green" != "driver-verified").

Known under-approximation: dynamic dispatch (getattr, registry lookups,
strings naming functions) is invisible to the walk — code reached only
that way needs a hand re-queue, as before.

Output is PRIORITIZED for rotation building: oldest verdict first, then
name. Spare window slots each round should be filled from the top —
over rounds this cycles every stale verdict through re-verification.

Usage:
    python tests/stale_green_check.py                # prioritized names
    python tests/stale_green_check.py --explain      # + changed symbols
    python tests/stale_green_check.py --limit 48     # top-N for a window
    python tests/stale_green_check.py --next-window  # propose the next
        50-slot rotation: assumes the CURRENT first-50 window gets fresh
        verdicts on this round's final head, fills slots with the oldest
        stale names, then pads with the oldest-verdict fresh names
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = "convex_batch_processor_spark"
_PKG_DIR = os.path.join(_REPO, _PKG)
_WORKTREE = "WORKTREE"  # sentinel commit name for the working tree


# --- git plumbing ---------------------------------------------------------

def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=_REPO, check=True,
        capture_output=True, text=True,
    ).stdout


def _sidecar_base(path: str) -> str | None:
    """Explicitly-recorded driver-run base: a ``CORRECTNESS_r{N}.json.base``
    file holding one commit hash (VERDICT r10 #4 — lets a round's base be
    pinned from RECORDED state even while the verdicts file itself stays
    untracked). Returns the hash iff the file exists and names a real
    commit; a stale/garbage sidecar is ignored with a warning rather than
    trusted."""
    side = path + ".base"
    if not os.path.exists(side):
        return None
    try:
        with open(side) as f:
            ref = f.read().strip()
        # a FULL commit hash only: a symbolic ref ('HEAD', a branch, a
        # tag) would re-resolve to a DIFFERENT commit as history moves —
        # a silently moving verdict base that masks stale-green names,
        # the exact failure recorded state exists to prevent
        if not re.fullmatch(r"[0-9a-f]{40}", ref):
            print(f"warning: {os.path.basename(side)} must contain a "
                  f"full 40-hex commit hash, not {ref!r} — ignoring it",
                  file=sys.stderr)
            return None
        return _git("rev-parse", "--verify", f"{ref}^{{commit}}").strip()
    except (OSError, subprocess.CalledProcessError):
        print(f"warning: {os.path.basename(side)} does not name a "
              "resolvable commit — ignoring it", file=sys.stderr)
        return None


def verified_states(strict: bool = False) -> dict[int, str]:
    """Round number -> commit hash of the code state the driver verified.

    Resolution order, most- to least-recorded:
      1. a ``CORRECTNESS_r{N}.json.base`` sidecar naming the commit;
      2. the first parent of the commit that ADDED the verdicts file;
      3. (non-strict only) the clean-tree + committer-time<=mtime
         heuristic mapping an untracked current-round file to HEAD.
    With ``strict=True`` the heuristic tier is DISABLED — every base must
    come from recorded state (VERDICT r10 #4: rotation derivation must
    never depend on an mtime); unresolved rounds raise SystemExit with
    the fix instruction instead of silently degrading the window."""
    out: dict[int, str] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        side = _sidecar_base(path)
        line = _git("log", "--diff-filter=A", "--format=%H %P", "--",
                    os.path.basename(path)).strip()
        if side is not None:
            # ADVICE r11: when the verdicts file IS committed, the git
            # ADD-commit parent is the stronger record — a stale or
            # hand-edited sidecar must not silently override it. Prefer
            # git and warn on disagreement; the sidecar remains
            # authoritative only while the file is untracked (its
            # designed role: pinning the base BEFORE the commit lands).
            git_parent = None
            if line:
                parts = line.splitlines()[0].split()
                if len(parts) >= 2:
                    git_parent = parts[1]
            if git_parent is not None and git_parent != side:
                print(
                    f"warning: CORRECTNESS_r{rnd:02d}.json.base names "
                    f"{side[:12]} but the git ADD-commit parent is "
                    f"{git_parent[:12]} — preferring the git-derived "
                    "base (stale or hand-edited sidecar?)",
                    file=sys.stderr,
                )
                out[rnd] = git_parent
            else:
                out[rnd] = side
            continue
        if not line:
            # The file exists but no commit added it. The common case is
            # the CURRENT round: the driver just wrote round N's verdicts
            # and the round-N commit doesn't exist yet. If the file is
            # genuinely untracked and no TRACKED file is modified, those
            # verdicts were issued against HEAD — map them there instead
            # of the unresolvable-base stale fallback, which would flag
            # the entire freshly-verified window as stale and distort
            # --next-window (VERDICT r8 "what's wrong" #1). A dirty tree
            # keeps the conservative fallback: we can't prove the edits
            # postdate the driver run.
            #
            # A clean tree alone is NOT proof either (ADVICE r9): commits
            # can land AFTER the driver run while the verdicts file stays
            # untracked, and mapping those verdicts to the NEWER head
            # would silently mask genuinely stale-green entries. HEAD is
            # the driver's base only if nothing was committed after the
            # verdicts file was written: require HEAD's committer time
            # <= the file's mtime, else stay unresolved (conservative —
            # stale_green() then flags that round's names with a warning;
            # committing the verdicts file pins its base permanently).
            tracked = _git("ls-files", "--",
                           os.path.basename(path)).strip() != ""
            if strict and not tracked:
                raise SystemExit(
                    f"CORRECTNESS_r{rnd:02d}.json is untracked and has no "
                    f".base sidecar — commit it (or write "
                    f"CORRECTNESS_r{rnd:02d}.json.base with the driver-run "
                    "HEAD) before deriving a rotation; window bases must "
                    "come from recorded state, not mtime heuristics"
                )
            clean = _git("status", "--porcelain",
                         "--untracked-files=no").strip() == ""
            if not tracked and clean:
                try:
                    mtime = os.path.getmtime(path)
                except OSError:
                    mtime = None
                head_time = int(
                    _git("show", "-s", "--format=%ct", "HEAD").strip())
                if mtime is not None and head_time <= mtime:
                    out[rnd] = _git("rev-parse", "HEAD").strip()
                else:
                    print(
                        f"warning: CORRECTNESS_r{rnd:02d} is untracked and "
                        "HEAD postdates it — cannot resolve the driver-run "
                        "base; commit the verdicts file to pin it",
                        file=sys.stderr,
                    )
            continue
        parts = line.splitlines()[0].split()
        if len(parts) >= 2:  # parts[1] = first parent
            out[rnd] = parts[1]
    if strict:
        # completeness backstop: EVERY round with a verdicts file must
        # have resolved from recorded state — the untracked branch above
        # aborts early, but a staged-yet-uncommitted file (tracked, no
        # ADD commit) or a root-commit ADD (no parent) would otherwise
        # fall through silently, and stale_green(strict=True) would then
        # mark that whole round "<unresolvable verdict base>" and flood
        # --next-window with spurious requeues
        have = {
            int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
            for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
        }
        missing = sorted(have - set(out))
        if missing:
            names = ", ".join(f"CORRECTNESS_r{r:02d}.json" for r in missing)
            raise SystemExit(
                f"cannot resolve the driver-run base for {names} from "
                "recorded state — commit the file(s) (or write a "
                ".base sidecar with the driver-run commit hash) before "
                "deriving a rotation"
            )
    return out


def latest_verdicts() -> dict[str, int]:
    """Query name -> latest round with a driver verdict under that name."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            for name in json.load(f):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


# --- module layout -----------------------------------------------------------

def _module_files() -> dict[str, str]:
    """Dotted module name -> repo-relative file path, package-internal."""
    out: dict[str, str] = {}
    for path in glob.glob(os.path.join(_PKG_DIR, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, _REPO).replace(os.sep, "/")
        mod = rel[:-len(".py")].replace("/", ".")
        if mod.endswith(".__init__"):
            mod = mod[:-len(".__init__")]
        out[mod] = rel
    return out


_MODULES = _module_files()


# --- per-file structure (defs + imports), per git state ----------------------

def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(node, (ast.Module, ast.FunctionDef,
                              ast.AsyncFunctionDef, ast.ClassDef))
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body.pop(0)
            if not body:
                body.append(ast.Pass())
    return tree


class _FileInfo:
    """Top-level structure of one file at one git state.

    Imports are collected from the WHOLE tree (function-local imports are
    a common in-repo pattern for lazy llmops loading) and attached at
    module scope — an over-approximation that can only widen a query's
    reach, never hide a dependency. Assign targets record only plain
    names: an attribute target like ``fn.__doc__ = ...`` must not
    clobber the FunctionDef entry for ``fn``."""

    def __init__(self, source: str, module: str):
        tree = _strip_docstrings(ast.parse(source))
        self.defs: dict[str, ast.AST] = {}
        # alias -> dotted module (module imports) / (module, symbol)
        self.mod_imports: dict[str, str] = {}
        self.sym_imports: dict[str, tuple[str, str]] = {}
        # root name -> full dotted modules bound via plain `import a.b.c`
        self.dotted_imports: dict[str, set[str]] = {}
        pkg_parts = module.split(".")[:-1] if not _MODULES.get(
            module, "").endswith("__init__.py") else module.split(".")
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.defs[t.id] = node
                    elif isinstance(t, (ast.Tuple, ast.List)):
                        for el in t.elts:
                            if isinstance(el, ast.Name):
                                self.defs[el.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name):
                self.defs[node.target.id] = node
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if not a.name.startswith(_PKG):
                        continue
                    if a.asname:
                        self.mod_imports[a.asname] = a.name
                    else:  # binds the root; usage is the full dotted chain
                        self.dotted_imports.setdefault(
                            a.name.split(".")[0], set()).add(a.name)
            elif isinstance(node, ast.ImportFrom):
                if node.level:
                    base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                    stem = ".".join(base + ([node.module] if node.module else []))
                else:
                    stem = node.module or ""
                if not stem.startswith(_PKG):
                    continue
                for a in node.names:
                    alias = a.asname or a.name
                    if f"{stem}.{a.name}" in _MODULES:  # submodule import
                        self.mod_imports[alias] = f"{stem}.{a.name}"
                    else:
                        self.sym_imports[alias] = (stem, a.name)


_INFO_CACHE: dict[tuple[str, str], _FileInfo | None] = {}


def _file_info(commit: str, module: str) -> _FileInfo | None:
    key = (commit, module)
    if key in _INFO_CACHE:
        return _INFO_CACHE[key]
    path = _MODULES.get(module)
    info: _FileInfo | None = None
    if path is not None:
        try:
            if commit == _WORKTREE:
                with open(os.path.join(_REPO, path)) as f:
                    src = f.read()
            else:
                src = _git("show", f"{commit}:{path}")
            info = _FileInfo(src, module)
        except (subprocess.CalledProcessError, OSError, SyntaxError):
            info = None
    _INFO_CACHE[key] = info
    return info


# --- symbol reachability (computed on the working tree) ----------------------

def reachable_symbols(module: str, symbol: str) -> set[tuple[str, str]]:
    """All (module, top-level symbol) pairs reachable from
    ``module.symbol`` via names used in reachable defs and
    package-internal imports."""
    seen: set[tuple[str, str]] = set()
    todo = [(module, symbol)]
    while todo:
        mod, sym = todo.pop()
        if (mod, sym) in seen:
            continue
        info = _file_info(_WORKTREE, mod)
        if info is None:
            continue
        node = info.defs.get(sym)
        if node is None:
            # symbol imported-and-re-exported or missing: follow imports
            if sym in info.sym_imports:
                seen.add((mod, sym))
                todo.append(info.sym_imports[sym])
            continue
        seen.add((mod, sym))
        used: set[str] = set()
        # root name -> attribute chains hung off it, e.g. a.b.c() on
        # Name 'a' records ('b', 'c') — needed for both `import pkg.x`
        # (full dotted usage) and plain module aliases
        chains: dict[str, set[tuple[str, ...]]] = {}
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                used.add(n.id)
            elif isinstance(n, ast.Attribute):
                parts: list[str] = []
                cur: ast.AST = n
                while isinstance(cur, ast.Attribute):
                    parts.append(cur.attr)
                    cur = cur.value
                if isinstance(cur, ast.Name):
                    chains.setdefault(cur.id, set()).add(tuple(reversed(parts)))
        for u in used:
            if u != sym and u in info.defs:
                todo.append((mod, u))
            elif u in info.sym_imports:
                todo.append(info.sym_imports[u])
            elif u in info.mod_imports:
                target_mod = info.mod_imports[u]
                for chain in chains.get(u, ()):
                    if chain:
                        todo.append((target_mod, chain[0]))
            if u in info.dotted_imports:
                # plain `import a.b.c`: usage looks like a.b.c.sym — match
                # the longest imported module prefix, next attr = symbol
                for chain in chains.get(u, ()):
                    full = (u, *chain)
                    for dotted in info.dotted_imports[u]:
                        dparts = tuple(dotted.split("."))
                        if (len(full) > len(dparts)
                                and full[: len(dparts)] == dparts):
                            todo.append((dotted, full[len(dparts)]))
    return seen


# --- fingerprints -------------------------------------------------------------

def _symbol_dump(commit: str, mod: str, sym: str) -> str | None:
    info = _file_info(commit, mod)
    if info is None:
        return None
    node = info.defs.get(sym)
    if node is None:
        # pure re-export: fingerprint the import target's dump instead
        if sym in info.sym_imports:
            tmod, tsym = info.sym_imports[sym]
            return _symbol_dump(commit, tmod, tsym)
        return None
    return ast.dump(node, include_attributes=False)


# --- the guard ------------------------------------------------------------------

def stale_green(strict: bool = False) -> list[dict]:
    """Prioritized stale-green records ``{name, round, changed}`` where
    ``changed`` lists 'module.symbol' strings whose code differs between
    the verdict state and the working tree. Oldest verdict first.
    ``strict`` forwards to verified_states (recorded bases only)."""
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from convex_batch_processor_spark.queries import QUERIES

    states = verified_states(strict=strict)
    verdicts = latest_verdicts()
    reach_cache: dict[tuple[str, str], set[tuple[str, str]]] = {}
    out: list[dict] = []
    for name, spec in QUERIES.items():
        rnd = verdicts.get(name)
        if rnd is None:
            continue  # never verified — backlog, not stale
        if rnd not in states:
            # HAS a verdict but its round's base commit is unresolvable
            # (root commit for the CORRECTNESS-adding commit, rewritten
            # history, renamed file): unknown base = unverifiable
            # coverage. Treat as stale — silently exempting it would
            # quietly defeat the guard (ADVICE r7).
            print(
                f"warning: {name} verified in r{rnd} but that round's "
                "base commit is unresolvable — treating as stale",
                file=sys.stderr,
            )
            out.append({"name": name, "round": rnd,
                        "changed": ["<unresolvable verdict base>"]})
            continue
        start = (spec.fn.__module__, spec.fn.__name__)
        if start not in reach_cache:
            reach_cache[start] = reachable_symbols(*start)
        base = states[rnd]
        changed = sorted(
            f"{mod}.{sym}"
            for mod, sym in reach_cache[start]
            if _symbol_dump(base, mod, sym) != _symbol_dump(_WORKTREE, mod, sym)
        )
        if changed:
            out.append({"name": name, "round": rnd, "changed": changed})
    out.sort(key=lambda r: (r["round"], r["name"]))
    return out


def next_window(size: int = 50) -> list[str]:
    """Propose the next round's rotation list: the current first-``size``
    window is assumed freshly verified (the driver records its verdicts
    against this round's final head), remaining slots go to the oldest
    stale-green names, then — if capacity remains — to the
    oldest-verdict fresh names as freshness refreshes. Only oracle-backed
    names are proposed (a rows-only slot records no hash verdict).

    Derivation is STRICT (VERDICT r10 #4): every verdict round's base
    must resolve from recorded state (a committed verdicts file or a
    .base sidecar) — an untracked current-round file aborts with the
    commit-it instruction rather than deriving a window from an
    mtime-heuristic base."""
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)
    from convex_batch_processor_spark.queries import QUERIES

    current = set(list(QUERIES)[:size])
    verdicts = latest_verdicts()
    out: list[str] = []
    for rec in stale_green(strict=True):
        n = rec["name"]
        if n not in current and QUERIES[n].oracle:
            out.append(n)
        if len(out) == size:
            return out
    stale_names = set(out)
    fresh = sorted(
        (n for n in QUERIES
         if n not in current and n not in stale_names
         and n in verdicts and QUERIES[n].oracle),
        key=lambda n: (verdicts[n], n),
    )
    out.extend(fresh[: size - len(out)])
    return out


def main() -> None:
    explain = "--explain" in sys.argv
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    if "--next-window" in sys.argv:
        for n in next_window():
            print(n)
        return
    stale = stale_green()
    if not stale:
        print("no stale-green queries — every verdict covers HEAD")
        return
    shown = stale if limit is None else stale[:limit]
    print(f"{len(stale)} stale-green queries"
          f"{f' (top {limit})' if limit else ''}, oldest verdicts first:")
    for r in shown:
        if explain:
            short = [c.replace(_PKG + ".", "") for c in r["changed"]]
            print(f"  {r['name']} (r{r['round']}): " + ", ".join(short))
        else:
            print(f"  {r['name']} (r{r['round']})")


if __name__ == "__main__":
    main()
