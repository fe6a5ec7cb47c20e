"""Extract the per-epoch training/validation curve from an experiment's
logbook.txt (the artifact the runtime streams, runtime/logbook.py) into a
markdown table for RESULTS.md.

Usage: python scripts/collect_results.py experiments/<run>/logbook.txt
"""

import re
import sys


def parse(path):
    epoch = None
    lr = None
    rows = {}
    train_re = re.compile(r"total_loss_ema=([0-9.]+)")
    flow_re = re.compile(r"flow_loss_ema=([0-9.]+)")
    val_re = re.compile(r"epe_avg=([0-9.]+)")
    f1_re = re.compile(r"F1_avg=([0-9.]+)")
    ep_re = re.compile(r"==>.*Epoch (\d+)/(\d+)")
    lr_re = re.compile(r"lr: ([0-9.e-]+)")
    for line in open(path, errors="replace"):
        m = ep_re.search(line)
        if m:
            epoch = int(m.group(1))
            rows.setdefault(epoch, {})
            continue
        if epoch is None:
            continue
        m = lr_re.search(line)
        if m:
            rows[epoch]["lr"] = m.group(1)
        if "Train" in line:
            m = train_re.search(line)
            if m:
                rows[epoch]["train_total"] = float(m.group(1))
            m = flow_re.search(line)
            if m:
                rows[epoch]["train_flow"] = float(m.group(1))
        if "Validate" in line:
            m = val_re.search(line)
            if m:
                rows[epoch]["epe"] = float(m.group(1))
            m = f1_re.search(line)
            if m:
                rows[epoch]["f1"] = float(m.group(1))
    return rows


def main():
    rows = parse(sys.argv[1])
    print("| epoch | lr | train total (EMA) | val EPE (px) | val occ F1 |")
    print("|---|---|---|---|---|")
    for e in sorted(rows):
        r = rows[e]
        print("| %d | %s | %s | %s | %s |" % (
            e, r.get("lr", ""),
            "%.1f" % r["train_total"] if "train_total" in r else "",
            "%.3f" % r["epe"] if "epe" in r else "",
            "%.4f" % r["f1"] if "f1" in r else ""))


if __name__ == "__main__":
    main()
