"""Atomic generation-pair publication for two-artifact on-disk indexes.

Every persisted index in this engine is a PAIR of artifacts — a bulk
parquet directory and a small metadata file that must never be observed
mismatched (IVF: cells + centroids; PQ: codes + codebook; SQ8: codes +
limits; dedup: signatures + params). The publication discipline those
three implement per-module is factored here for new index kinds:

- a retrain/compaction writes BOTH artifacts as a fresh generation
  (``<dir>-<n>/``, ``<meta>-<n>``), then ONE ``os.replace`` of the
  pointer file names the pair — readers resolve through the pointer, so
  they always see a matched (bulk, meta) generation;
- GC of superseded generations is DEFERRED ONE FLIP: the generation that
  was live immediately before this flip survives until the next one, so
  a reader that resolved the pointer pre-flip (or holds a lazily-listed
  DataFrame over the old directory) finishes its scan instead of dying
  on a mid-read rmtree. Generations ≤ N-2 and crash orphans are swept.

The pointerless layout (``<dir>/``, ``<meta>``) is the fresh-build
original; the first flip introduces the pointer.
"""

from __future__ import annotations

import os
import shutil


class GenerationPair:
    """Pointer discipline for one index at ``path`` with artifact names
    ``dir_name`` (bulk directory) and ``meta_name`` (metadata file, must
    contain a '.' — generations insert ``-<n>`` before the extension)."""

    def __init__(self, path: str, dir_name: str, meta_name: str,
                 pointer: str = "LIVE"):
        self.path = path
        self.dir_name = dir_name
        self.meta_name = meta_name
        self.pointer = pointer

    # ------------------------------------------------------------ resolve

    def live(self) -> tuple[str, str]:
        """The live (bulk dir, meta file) names; pointerless fallback."""
        try:
            with open(os.path.join(self.path, self.pointer)) as fh:
                parts = fh.read().split()
            return parts[0], parts[1]
        except OSError:
            return self.dir_name, self.meta_name

    def next_names(self) -> tuple[str, str]:
        """Names for the NEXT generation: the original pair on a fresh
        path, ``<dir>-<n>`` / ``<meta>-<n>`` after that."""
        cur, _ = self.live()
        if not os.path.isdir(os.path.join(self.path, cur)):
            return self.dir_name, self.meta_name
        gen = int(cur.rsplit("-", 1)[1]) + 1 if "-" in cur else 1
        stem, ext = os.path.splitext(self.meta_name)
        return f"{self.dir_name}-{gen}", f"{stem}-{gen}{ext}"

    # ------------------------------------------------------------ publish

    def flip(self, new_dir: str, new_meta: str) -> None:
        """Atomically publish (new_dir, new_meta); GC generations older
        than the immediately-superseded one (which outlives this flip for
        in-flight readers and is swept by the NEXT flip)."""
        keep = set(self.live()) | {new_dir, new_meta}
        tmp = os.path.join(self.path, self.pointer + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(f"{new_dir} {new_meta}")
        os.replace(tmp, os.path.join(self.path, self.pointer))
        prefix_d, prefix_m = self.dir_name, os.path.splitext(self.meta_name)[0]
        for name in os.listdir(self.path):
            if name in keep or name == self.pointer:
                continue
            full = os.path.join(self.path, name)
            if name == self.meta_name and os.path.isfile(full):
                continue  # original meta doubles as the index-exists marker
            if name.startswith(prefix_d) and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            elif name.startswith(prefix_m) and os.path.isfile(full):
                os.remove(full)
