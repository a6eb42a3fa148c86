"""End-to-end CLI smoke: every mode driven against generated fixtures.

The pytest CLI matrix covers the same surface on the virtual CPU mesh;
this script is the REAL-DEVICE check — one command, every mode, fresh
fixtures in a temp dir, PASS/FAIL per mode, exit 1 on any failure.

Usage: python -m mini_parallel_tpu.tools.smoke [--keep] [--chunk 40]
"""

from __future__ import annotations

import argparse
import gzip
import os
import random
import sys
import tempfile


def _fixtures(tmp: str):
    random.seed(20260816)
    ref = bytes(random.choice(b"ACGT") for _ in range(3000))
    snp = 1500
    alt = b"A" if ref[snp:snp + 1] != b"A" else b"C"
    hap = ref[:snp] + alt + ref[snp + 1:]
    rc = bytes.maketrans(b"ACGT", b"TGCA")

    def write_fq(name, reads):
        path = os.path.join(tmp, name)
        with gzip.open(path, "wt", compresslevel=1) as f:
            for i, r in enumerate(reads):
                f.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")
        return path

    mapped = [hap[s:s + 80] for s in
              (random.randrange(0, 2900) for _ in range(120))]
    r1 = [ref[i * 20:i * 20 + 60] for i in range(40)]
    r2 = [r.translate(rc)[::-1] for r in r1]
    with gzip.open(os.path.join(tmp, "ref.fa.gz"), "wt") as f:
        f.write(">chrS\n")
        for i in range(0, len(ref), 70):
            f.write(ref[i:i + 70].decode() + "\n")
    for lane in (1, 2):
        for r in (1, 2):  # test-wgs reads the first lane PAIR (R1 + R2)
            write_fq(f"SMK_L{lane:03d}_R{r}_001.fastq.gz", mapped[:60])
    # long-align FASTA pair (> LONG_PAIR_THRESHOLD -> column-strip engine)
    la = bytes(random.choice(b"ACGT") for _ in range(6000))
    lb = la[500:5500] + bytes(random.choice(b"ACGT") for _ in range(800))
    for name, seq in (("la_a.fa", la), ("la_b.fa", lb)):
        with open(os.path.join(tmp, name), "w") as f:
            f.write(">s\n" + seq.decode() + "\n")
    return {
        "la_a": os.path.join(tmp, "la_a.fa"),
        "la_b": os.path.join(tmp, "la_b.fa"),
        "ref_fa": os.path.join(tmp, "ref.fa.gz"),
        "reads": write_fq("reads.fastq.gz", mapped),
        "r1": write_fq("r1.fastq.gz", r1),
        "r2": write_fq("r2.fastq.gz", r2),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", action="store_true",
                    help="keep the fixture dir (prints its path)")
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--allow-cpu", action="store_true",
                    help="append --allow-cpu to every mode (no accelerator)")
    args = ap.parse_args(argv)

    from mini_parallel_tpu.cli import main as cli_main

    tmp = tempfile.mkdtemp(prefix="mpt_smoke_")
    fx = _fixtures(tmp)
    # hermetic: force-assign so inherited shell WGS_* can never point the
    # full-wgs/test-wgs modes at a real (multi-GB) dataset
    os.environ["GPU_CHUNK_SIZE_READS"] = str(args.chunk)
    os.environ["WGS_DATA_DIR"] = tmp
    os.environ["WGS_SAMPLE_ID"] = "SMK"
    os.environ["WGS_LANES"] = "2"
    os.environ["WGS_READS_PER_LANE"] = "2"
    cwd = os.getcwd()
    os.chdir(tmp)

    modes = [
        ("direct", ["-1", "ACGTACGT", "-2", "ACGAACGT"]),
        ("direct-sw", ["-1", "ACGTACGT", "-2", "ACGAACGT", "--mode", "sw"]),
        ("test-wgs", ["--test-wgs"]),
        ("full-wgs", ["--full-wgs", "--retries", "1"]),
        ("pair-files", ["--files", "-1", fx["r1"], "-2", fx["r2"]]),
        ("kmer", ["--kmer", fx["reads"], "-k", "21",
                  "--kmer-out", "k.tsv.gz"]),
        ("kmer-multi", ["--kmer", f"{fx['r1']},{fx['r2']}", "-k", "15"]),
        ("complementarity", ["--complementarity", "-1", fx["r1"],
                             "-2", fx["r2"]]),
        ("variant-prep", ["--variant-prep", fx["reads"],
                          "--reference", fx["ref_fa"], "--vcf-out", "v.vcf"]),
        ("variant-gapped-affine", ["--variant-prep", fx["reads"],
                                   "--reference", fx["ref_fa"], "--gapped",
                                   "--gap-model", "affine",
                                   "--sam-out", "o.sam"]),
        ("genotype", ["--variant-prep", fx["reads"], "--reference",
                      fx["ref_fa"], "--genotype", "--vcf-out", "g.vcf"]),
        ("long-align", ["--long-align", "-1", fx["la_a"], "-2", fx["la_b"],
                        "--mode", "sw"]),
    ]
    failures = 0
    try:
        # row 0: the on-chip kernel parity gate (tools/kernel_check) —
        # every device kernel bit-exact vs its host oracle ON THE CHIP
        # (interpret parity does not imply Mosaic correctness)
        from mini_parallel_tpu.tools import kernel_check

        try:
            kc_argv = ["--reads", "60"]
            if args.allow_cpu:
                kc_argv.append("--allow-cpu")
            rc = kernel_check.main(kc_argv)
        except Exception as e:  # noqa: BLE001
            rc = 99
            print(f"kernel-check exception: {e}")
        ok = rc == 0
        failures += 0 if ok else 1
        print(f"[{'PASS' if ok else 'FAIL'}] kernel-parity-gate")

        for name, argv_m in modes:
            if args.allow_cpu:
                argv_m = argv_m + ["--allow-cpu"]
            sink: list = []
            try:
                rc = cli_main(argv_m, echo=sink.append)
            except Exception as e:  # noqa: BLE001 — report, keep smoking
                rc, sink = 99, [f"exception: {e}"]
            ok = rc == 0
            failures += 0 if ok else 1
            tail = sink[-1] if sink else ""
            print(f"[{'PASS' if ok else 'FAIL'}] {name}"
                  + ("" if ok else f" (rc={rc}): {tail[-200:]}"))
    finally:
        os.chdir(cwd)
    if args.keep or failures:
        print(f"fixtures: {tmp}")
    else:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    print(f"{len(modes) + 1 - failures}/{len(modes) + 1} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
