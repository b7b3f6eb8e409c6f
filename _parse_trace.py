"""Parse a perfetto trace: per-op-category device time attribution."""
import gzip, json, sys, collections, re

path = sys.argv[1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"] if isinstance(data, dict) else data
# find device-side complete events (ph == 'X') on TPU tracks
pid_names = {}
tid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

dur_by_name = collections.Counter()
n_by_name = collections.Counter()
total = 0.0
track_totals = collections.Counter()
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e["pid"], "")
    tname = tid_names.get((e["pid"], e.get("tid")), "")
    track = f"{pname}/{tname}"
    track_totals[track] += e.get("dur", 0)
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    if "XLA Ops" not in tname:
        continue
    name = e["name"]
    dur_by_name[name] += e.get("dur", 0)
    n_by_name[name] += 1
    total += e.get("dur", 0)

print("== tracks ==")
for t, d in track_totals.most_common(12):
    print(f"  {d/1e3:10.2f} ms  {t}")

def category(name):
    n = name.lower()
    if "conv" in n: return "conv"
    if "dot" in n or "matmul" in n: return "dot"
    if "reduce-window" in n or "select-and-scatter" in n or "maxpool" in n: return "pool"
    if "fusion" in n: return "fusion"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n: return "copy/layout"
    if "all-reduce" in n or "collective" in n: return "collective"
    return "other"

cats = collections.Counter()
for name, d in dur_by_name.items():
    cats[category(name)] += d

print(f"\n== categories (total {total/1e3:.2f} ms) ==")
for c, d in cats.most_common():
    print(f"  {d/total*100:5.1f}%  {d/1e3:9.2f} ms  {c}")

print("\n== top 25 ops ==")
for name, d in dur_by_name.most_common(25):
    print(f"  {d/total*100:5.1f}%  {d/1e3:8.2f} ms  n={n_by_name[name]:<4} {name[:110]}")
