"""File-based sources (reference S4-S7) — golden-fixture and demo parity.

The production source is the interleaved Lance/Parquet table
(``sources/interleaved.py``); these readers cover the reference's file-path
entry points: directory-of-images globbing with extension whitelist and
sorted order (/root/reference/app/utils.py:153-174,
DSV/run_dpsk_ocr_eval_batch.py:106-118), page-range selection
(app/processors.py:514-549), and upload lists with skip-on-error → here
quarantine-on-error (app/processors.py:345-358).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

# the reference's whitelist (app/utils.py:158); eval-batch uses jpg-only
IMAGE_EXTENSIONS = ("jpg", "jpeg", "png", "webp", "bmp", "tiff", "tif")


def is_image_file(path: str, extensions=IMAGE_EXTENSIONS) -> bool:
    return path.lower().rsplit(".", 1)[-1] in extensions if "." in path else False


def list_images_in_dir(dir_path: str, extensions=IMAGE_EXTENSIONS) -> list[str]:
    """Sorted image paths (sorted-filename order is load-bearing in the
    reference — it defines output order, app/utils.py:173)."""
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if is_image_file(f, extensions)
    )


def read_image_dir(
    dir_path: str, extensions=IMAGE_EXTENSIONS
) -> ray.data.Dataset:
    """Directory of images → Dataset of (doc_id, path, payload bytes).

    ``doc_id`` is the sorted-order index as a zero-padded string so the
    file-order semantics survive any parallel read order.
    """
    paths = list_images_in_dir(dir_path, extensions)
    if not paths:  # read_binary_files([]) raises; empty dir → empty Dataset
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "payload": pa.array([], pa.binary()),
                }
            )
        )
    ds = ray.data.read_binary_files(paths, include_paths=True)

    order = {p: i for i, p in enumerate(paths)}

    def add_ids(batch: pa.Table) -> pa.Table:
        ps = batch["path"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array([f"img-{order[p]:08d}" for p in ps]),
                "path": batch["path"],
                "payload": batch["bytes"],
            }
        )

    return ds.map_batches(add_ids, batch_format="pyarrow")


def select_page_range(
    ds: ray.data.Dataset, page_start: int, page_end: int,
    *, page_col: str = "unit_id", n_pages: int | None = None,
) -> ray.data.Dataset:
    """1-based inclusive page-range clamp + filter (reference S4 semantics:
    clamp to [1, n], swap-free — start > end yields empty)."""
    lo = max(1, page_start)
    hi = min(n_pages, page_end) if n_pages is not None else page_end
    # unit_id / page_no are 0-based internally; the reference UI is 1-based
    return ds.filter(expr=f"{page_col} >= {lo - 1} and {page_col} <= {hi - 1}")
