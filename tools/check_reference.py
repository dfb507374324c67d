"""Reference-mount check ritual (VERDICT r1 item 9; SURVEY.md §0).

Run at the start of every round:

    python tools/check_reference.py

Scans /root/reference, prints a one-line state summary, and appends it
to docs/reference_mount_log.md so each round has a durable record of
what the mount contained when the round's code was written. If the
mount ever populates (>0 non-empty files), the script exits non-zero
with a loud banner: STOP and re-verify SURVEY.md's [UPSTREAM-K] rows
against the real tree before writing implementation code
(SURVEY.md:42-48 instruction).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import sys

MOUNT = "/root/reference"
LOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "reference_mount_log.md")


def scan(mount: str = MOUNT):
    files = []
    for root, _dirs, names in os.walk(mount):
        for name in sorted(names):
            path = os.path.join(root, name)
            try:
                size = os.path.getsize(path)
            except OSError:
                size = -1
            files.append((os.path.relpath(path, mount), size))
    files.sort()
    total = sum(max(s, 0) for _, s in files)
    digest = hashlib.sha256(
        "\n".join(f"{p}:{s}" for p, s in files).encode()).hexdigest()[:16]
    return files, total, digest


def main() -> int:
    if not os.path.isdir(MOUNT):
        line = f"mount {MOUNT} MISSING"
        populated = False
    else:
        files, total, digest = scan()
        nonempty = [f for f in files if f[1] > 0]
        populated = bool(nonempty)
        line = (f"{len(files)} file(s), {len(nonempty)} non-empty, "
                f"{total} bytes total, manifest sha256[:16]={digest}")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC")
    record = f"- {stamp}: {line}\n"
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    if not os.path.exists(LOG):
        with open(LOG, "w") as fh:
            fh.write("# Reference mount state per round\n\n"
                     "Appended by `python tools/check_reference.py` "
                     "(run at every round start).\n\n")
    with open(LOG, "a") as fh:
        fh.write(record)
    print(record.strip())
    if populated:
        print("=" * 70)
        print("REFERENCE MOUNT IS POPULATED. Before writing code this")
        print("round: re-verify SURVEY.md [UPSTREAM-K] rows against the")
        print("real tree and add true file:line citations (SURVEY.md §0).")
        print("=" * 70)
        for p, s in files[:50]:
            print(f"  {s:>10}  {p}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
