"""Build dist/tsf.zip for spark-submit --py-files (stdlib only)."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "tsf.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "tsf").glob("*.py")):
            z.write(py, f"tsf/{py.name}")
    return out


if __name__ == "__main__":
    print(build())
