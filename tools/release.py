#!/usr/bin/env python
"""Version-bump tooling — the reference's `just release X.Y.Z` analogue
(reference: justfile + cliff.toml: bump, changelog header, tag).

Usage: python tools/release.py X.Y.Z [--tag]

- rewrites ``version = "..."`` in pyproject.toml and ``__version__`` in
  vuke_tpu/__init__.py,
- verifies CHANGELOG.md has a section for the new version (refuses
  otherwise — the changelog is written by hand, not generated),
- with --tag, creates an annotated git tag vX.Y.Z from the current HEAD.
"""

import re
import subprocess
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) != 1 or not re.fullmatch(r"\d+\.\d+\.\d+", args[0]):
        sys.exit("usage: release.py X.Y.Z [--tag]")
    version = args[0]

    changelog = (ROOT / "CHANGELOG.md").read_text()
    if not re.search(rf"^## {re.escape(version)}\b", changelog, re.M):
        sys.exit(f"CHANGELOG.md has no '## {version}' section — write it first")

    pyproject = ROOT / "pyproject.toml"
    text = pyproject.read_text()
    new, n = re.subn(r'(?m)^version = "[^"]+"', f'version = "{version}"', text)
    if n != 1:
        sys.exit("pyproject.toml: expected exactly one version line")
    pyproject.write_text(new)

    init = ROOT / "vuke_tpu" / "__init__.py"
    itext = init.read_text()
    if "__version__" in itext:
        itext = re.sub(r'__version__ = "[^"]+"',
                       f'__version__ = "{version}"', itext)
    else:
        itext += f'\n__version__ = "{version}"\n'
    init.write_text(itext)

    print(f"bumped to {version}")
    if "--tag" in sys.argv:
        subprocess.run(["git", "-C", str(ROOT), "tag", "-a", f"v{version}",
                        "-m", f"v{version}"], check=True)
        print(f"tagged v{version}")


if __name__ == "__main__":
    main()
