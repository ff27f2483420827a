"""Checkpoint metadata store (SURVEY.md §2.2 K5).

The reference keeps one JSON doc per source at ``metadata/{table}.json``
on S3 (template.py:174-195): ``{last_processed_commit, table_name, path,
inserted_time}``, read-modify-written per run (with an accidental
double-encoding quirk at template.py:183-185 that we do not reproduce).

This store is filesystem-backed (local or any Hadoop-visible mount); the
interface is the engine contract, the backend is swappable. Two fixes
over the reference:

* ``advance()`` is meant to be called AFTER the downstream sink
  succeeds — the reference checkpoints before delivery
  (template.py:244-251), making the pipeline at-most-once; callers here
  get at-least-once by ordering (see IncrementalReader.read + commit).
* checkpoint docs are written atomically (tmp + rename) so a crashed
  writer can't leave a torn JSON behind.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass
from datetime import datetime, timezone


@dataclass
class Checkpoint:
    """Schema mirrors the reference's metadata doc (template.py:245-251)."""

    last_processed_commit: str
    table_name: str
    path: str
    inserted_time: str


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table_name: str) -> str:
        return os.path.join(self.root, f"{table_name}.json")

    def exists(self, table_name: str) -> bool:
        """template.py:174-180 (__check_meta_data_file)."""
        return os.path.exists(self._path(table_name))

    def read(self, table_name: str) -> Checkpoint:
        """template.py:182-185 (__read_meta_data) — single-encoded JSON."""
        with open(self._path(table_name)) as f:
            return Checkpoint(**json.load(f))

    def write(self, ckpt: Checkpoint) -> None:
        """template.py:187-191 (__push_meta_data), atomic."""
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(ckpt), f)
        os.replace(tmp, self._path(ckpt.table_name))

    def advance(self, table_name: str, path: str, commit: str) -> None:
        self.write(
            Checkpoint(
                last_processed_commit=commit,
                table_name=table_name,
                path=path,
                inserted_time=datetime.now(timezone.utc).isoformat(),
            )
        )

    def clean(self, table_name: str) -> None:
        """template.py:193-195 (clean_check_point) — reset to full reload."""
        try:
            os.remove(self._path(table_name))
        except FileNotFoundError:
            pass
