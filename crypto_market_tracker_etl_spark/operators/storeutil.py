"""The staged-swap dance shared by the plain-parquet stores.

One implementation of the five-step crash-safe replacement (review r9 —
this existed inline in three places; a crash-safety fix had to be
applied to each):

    rmtree leftover ``.compacting``/``.old``  (garbage from a prior crash)
    write the COMPLETE replacement to ``<live>.compacting``
    rename live -> ``<live>.old``             (atomic)
    rename ``.compacting`` -> live            (atomic)
    rmtree ``.old``

Every intermediate state is healable because each rename is atomic and
the staged dir is complete (Spark's ``_SUCCESS``) before the first
rename. RECOVERY deliberately stays per-store: the curation stores heal
at path grain (``curation_stream._recover_swap``), the signature store
at batch grain with batch-identity preservation
(``incremental_dedup._recover_batch_swaps``) — same rules, different
units. ``ann_index.maintain`` does NOT use this helper by design: its
swap parks the original under a uuid name, rolls back on a failed
second rename, and keeps the staging dir for debugging — index rebuilds
are rare, expensive, and worth the forensic residue; store compactions
are routine and must self-clean.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

STAGED_SUFFIX = ".compacting"
OLD_SUFFIX = ".old"


def staged_swap(live: str, write_staged: Callable[[str], None]) -> None:
    """Replace the directory ``live`` with whatever ``write_staged``
    materializes at the staging path it is given. Single-writer
    contract (the callers' documented contract); crash anywhere is
    healed by the caller's recovery routine on the next listing."""
    staged, old = live + STAGED_SUFFIX, live + OLD_SUFFIX
    for leftover in (staged, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    write_staged(staged)
    os.rename(live, old)
    os.rename(staged, live)
    shutil.rmtree(old)
