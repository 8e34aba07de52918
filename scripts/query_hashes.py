"""Per-query source fingerprints — mechanical changed-set derivation.

ADVICE r19 #3: the rotation's "changed set" was prose-declared only (the
`# (1) new/changed` marker in registry._PRIORITY), so an undeclared
builder/oracle text change (the r19 doc_ngram_novelty exception) could
not fail any test — the reproducibility check trusts the marker. This
tool makes source drift mechanically visible:

- For every registered query, fingerprint = sha256 over the builder's
  exact source text (``inspect.getsource`` — includes the ``@register``
  decorator call, so inline oracles/tags/docs are covered) joined with
  the RESOLVED oracle SQL (oracles are often module-level constants the
  builder source alone would miss). Truncated to 16 hex chars.
- ``--apply`` writes the full map to QUERY_HASHES.json (tracked).
- ``tests/test_rotate_prefix.py::test_query_hashes_pin_source`` pins the
  committed file == the computed map, so ANY builder/oracle text change
  forces a visible QUERY_HASHES.json diff in the same commit, and
  ``test_changed_hashes_are_declared`` cross-checks the working tree
  against the file as of the LAST round-close commit (the one that added
  the newest tracked CORRECTNESS_r*.json): every query whose fingerprint
  moved since then must be listed in the declared changed marker. In a
  saturated cap-0 round the declared set is empty, so NO gated query's
  text may change — exactly the discipline the rotation rule demands,
  now test-enforced instead of prose-enforced.

Known envelope: a change confined to a SHARED helper function called by
the builder does not move the builder's own source text, so it escapes
the fingerprint. That class is still covered by the oracle differential
itself (a semantic helper change flips hashes in the driver gate); this
tool targets the silent-text-change class, not all change detection.

Usage: python scripts/query_hashes.py [--apply]
Without --apply, prints the queries whose fingerprints differ from the
committed QUERY_HASHES.json (empty output + exit 0 = clean).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HASH_FILE = "QUERY_HASHES.json"


def compute_hashes() -> dict[str, str]:
    from multithreaded_mapreduce_library_spark.registry import load_all

    out: dict[str, str] = {}
    for name, spec in load_all().items():
        blob = inspect.getsource(spec.builder) + "\x00" + (spec.oracle or "<rows-only>")
        out[name] = hashlib.sha256(blob.encode()).hexdigest()[:16]
    return dict(sorted(out.items()))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, HASH_FILE)
    current = compute_hashes()
    if "--apply" in sys.argv[1:]:
        with open(path, "w") as f:
            json.dump(current, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"# wrote {len(current)} fingerprints to {path}")
        return
    committed = json.load(open(path)) if os.path.exists(path) else {}
    drifted = sorted(
        set(k for k in current if current[k] != committed.get(k))
        | (set(committed) - set(current))
    )
    for name in drifted:
        print(f"{name}: {committed.get(name, '<absent>')} -> {current.get(name, '<removed>')}")
    raise SystemExit(1 if drifted else 0)


if __name__ == "__main__":
    main()
