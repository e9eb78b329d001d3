"""Recompute catalog._DRIVER_WINDOW from the staleness policy.

Prints the expected window (anchor + 49 stalest) using exactly the
ranking tests/test_registry.py::test_rotation_is_staleness_driven pins:
rank every non-anchor entry by the round of its most recent green
driver row (full rows+schema+hash, or a clean rows-only pass),
never-green ranks stalest (auto-enrolling this round's registrations),
tie-break by registration order, considering only CORRECTNESS files of
rounds strictly before the rotation comment's round number. Run after
registering new entries; paste the output into catalog._DRIVER_WINDOW.
"""
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from data_analyse_marche_emploi_spark import catalog  # noqa: E402

ROOT = Path(catalog.__file__).resolve().parents[1]
src = Path(catalog.__file__).read_text()
round_no = int(re.search(r"# Round-(\d+) rotation", src).group(1))

latest: dict[str, int] = {}
for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
    r = int(re.search(r"_r(\d+)", p.name).group(1))
    if r >= round_no:
        continue
    for q, res in json.load(p.open()).items():
        full = (
            res.get("rows_match")
            and res.get("schema_match")
            and res.get("hash_match")
        )
        rows_only = (
            res.get("err") == "no_oracle" and res.get("spark_rows") is not None
        )
        if full or rows_only:
            latest[q] = max(latest.get(q, -1), r)

anchor = catalog._DRIVER_WINDOW[0]
reg_index = {n: i for i, n in enumerate(catalog.QUERIES)}
ranked = sorted(
    (n for n in catalog.QUERIES if n != anchor),
    key=lambda n: (latest.get(n, -1), reg_index[n]),
)
window = [anchor, *ranked[:49]]
current = set(catalog._DRIVER_WINDOW)
print("_DRIVER_WINDOW = [")
for n in window:
    print(f'    "{n}",')
print("]")
print(
    f"# added: {sorted(set(window) - current)}\n"
    f"# dropped: {sorted(current - set(window))}",
    file=sys.stderr,
)
