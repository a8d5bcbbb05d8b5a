"""Host-side cost of patient-concat bags: native segmented packing vs the
threaded numpy fallback (r4 — the segs packers made PatientBagSplit
native-eligible). No device work: measures parse+concat+pad+convert only,
on the disk-fed fixture's 32 MB .pt slide bags grouped 2 slides/patient.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from toad_tpu.config import TaskConfig
from toad_tpu.data.batching import BagBatcher
from toad_tpu.data.synthetic import DEFAULT_ORIGINS
from toad_tpu.data.wsi_dataset import PatientBagSplit, WSIBagDataset

n_slides = 16
tmp, csv = bench._ensure_io_fixture(n_slides)
# fixture csv: one slide per case -> regroup 2 slides/patient by rewriting case ids
import pandas as pd

df = pd.read_csv(csv)
df["case_id"] = ["PAT_%d" % (i // 2) for i in range(len(df))]
csv2 = tmp / "patients.csv"
df.to_csv(csv2, index=False)
task = TaskConfig(
    name="bench_io_pat",
    csv_path=str(csv2),
    label_dicts=(
        {o: i for i, o in enumerate(DEFAULT_ORIGINS)},
        {"Primary": 0, "Metastatic": 1},
        {"F": 0, "M": 1},
    ),
)
ds = WSIBagDataset(task, csv2, data_dir=str(tmp))
pb = PatientBagSplit(ds.subset(range(n_slides)))
print(f"{len(pb)} patient bags, 2x8192x1024 f32 slides each", flush=True)

BUCKET = (16384,)
for wire in ("bfloat16", "int8"):
    for native in ("on", "off"):
        kw = dict(batch_size=4, bucket_sizes=BUCKET, mode="sequential", prefetch=0,
                  transfer_dtype=wire, native=native)
        b = BagBatcher(pb, **kw)
        for _ in b:  # warm page cache + .so build
            pass
        reps, t0 = 3, time.perf_counter()
        for _ in range(reps):
            for _ in BagBatcher(pb, **kw):
                pass
        dt = (time.perf_counter() - t0) / reps
        print(f"wire={wire:9s} native={native:3s}: {dt:6.2f} s/epoch", flush=True)
