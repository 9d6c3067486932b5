"""Install the repo's git hooks (currently: pre-commit smoke gate).

    python tools/install_hooks.py

Writes .git/hooks/pre-commit to run ``python tools/smoke.py`` against the
staged tree.  Bypass (emergencies only) with ``git commit --no-verify``.
"""

from __future__ import annotations

import os
import stat
import sys
from pathlib import Path

HOOK = """#!/bin/sh
# spark-graft pre-commit: never ship an import-broken registry again.
cd "$(git rev-parse --show-toplevel)" || exit 1
exec python tools/smoke.py
"""


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    hooks = repo / ".git" / "hooks"
    if not hooks.is_dir():
        print(f"no hooks dir at {hooks}", file=sys.stderr)
        return 1
    path = hooks / "pre-commit"
    path.write_text(HOOK)
    path.chmod(path.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    print(f"installed {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
