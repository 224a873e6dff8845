#!/usr/bin/env python
"""Path-traversal-safe archive extraction for the dataset pipeline
(reference: scripts/safe_extract.py — Zip Slip protection for the
McConkey download; same contract, plus tar support since the dataset
mirrors also ship .tar.gz).

Every entry must resolve inside the output directory: no absolute
paths, no `..` traversal, no symlink escapes (tar).

    python scripts/safe_extract.py <archive.zip|.tar.gz> <output_dir>
"""

from __future__ import annotations

import pathlib
import sys
import tarfile
import zipfile


def _check_inside(out_dir: pathlib.Path, name: str) -> pathlib.Path:
    target = (out_dir / name).resolve()
    if not target.is_relative_to(out_dir):
        raise RuntimeError(f"unsafe archive entry escapes output dir: "
                           f"{name!r}")
    return target


def safe_extract(archive, out_dir, verbose: bool = True) -> int:
    """Extract `archive` into `out_dir`, refusing any entry that would
    land outside it. Returns the number of entries extracted."""
    archive = pathlib.Path(archive)
    out_dir = pathlib.Path(out_dir).resolve()
    if not archive.exists():
        raise FileNotFoundError(archive)
    out_dir.mkdir(parents=True, exist_ok=True)

    n = 0
    if zipfile.is_zipfile(archive):
        with zipfile.ZipFile(archive) as zf:
            for info in zf.infolist():
                _check_inside(out_dir, info.filename)
                zf.extract(info, out_dir)
                n += 1
                if verbose and n % 50 == 0:
                    print(f"  {n} entries...")
    elif tarfile.is_tarfile(archive):
        with tarfile.open(archive) as tf:
            for m in tf:
                _check_inside(out_dir, m.name)
                if not (m.isfile() or m.isdir() or m.issym() or m.islnk()):
                    # device nodes / FIFOs have no place in a dataset
                    raise RuntimeError(
                        f"unsupported special member in archive: {m.name!r}")
                if m.issym() or m.islnk():
                    link = pathlib.Path(m.linkname)
                    if link.is_absolute():
                        raise RuntimeError(
                            f"unsafe absolute link in archive: {m.name!r}"
                            f" -> {m.linkname!r}")
                    if m.islnk():
                        # tarfile resolves HARDLINK targets relative to the
                        # extraction root, not the member's parent dir
                        _check_inside(out_dir, m.linkname)
                    else:
                        # symlinks resolve relative to the member's parent
                        _check_inside(out_dir,
                                      str(pathlib.Path(m.name).parent / link))
                # filter='data' (Py>=3.12) independently rejects escaping
                # paths/links and special members — defense in depth
                tf.extract(m, out_dir, filter="data")
                n += 1
                if verbose and n % 50 == 0:
                    print(f"  {n} entries...")
    else:
        raise RuntimeError(f"not a zip or tar archive: {archive}")
    if verbose:
        print(f"extracted {n} entries -> {out_dir}")
    return n


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print(__doc__)
        return 2
    safe_extract(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
