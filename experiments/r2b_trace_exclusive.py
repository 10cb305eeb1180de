"""Round-2b experiment (kept for the record; see PERF.md train-step
section for results). Run on the axon TPU: nohup python -u <file> > log &
"""
import glob, re, sys
sys.path.insert(0, "/root/repo")
from vtp_tpu.utils.xplane import parse_xspace, device_planes

tdir = sys.argv[1]
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
pbs = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
p = device_planes(parse_xspace(open(pbs[0], "rb").read()))[0]
line = [l for l in p.lines if l.name == "XLA Ops"][0]
md = p.event_metadata
evs = sorted(line.events, key=lambda e: (e.offset_ps, -e.duration_ps))
stack, excl, cnt = [], {}, {}
for e in evs:
    while stack and stack[-1][1] <= e.offset_ps:
        stack.pop()
    if stack:
        excl[stack[-1][2]] = excl.get(stack[-1][2], 0) - e.duration_ps
    name = md.get(e.metadata_id, str(e.metadata_id))
    excl[name] = excl.get(name, 0) + e.duration_ps
    cnt[name] = cnt.get(name, 0) + 1
    stack.append((e.offset_ps, e.offset_ps + e.duration_ps, name))

def categorize(name):
    n = name.lower()
    m = re.search(r"=\s*[^ ]+\s+([a-z-]+)\(", name)
    kind = m.group(1) if m else n.split(".")[0].lstrip("%")
    if "custom-call" in n:
        return "pallas-kernel"
    return kind

cats = {}
for name, t in excl.items():
    c = categorize(name)
    a, k = cats.get(c, (0.0, 0))
    cats[c] = (a + t / 1e9, k + cnt.get(name, 0))
total = sum(v[0] for v in cats.values())
print(f"{tdir}: exclusive {total/nsteps:.1f} ms/step")
for c, (t, k) in sorted(cats.items(), key=lambda kv: -kv[1][0])[:14]:
    print(f"  {c:34s} {t/nsteps:8.2f} ms/step  x{k//nsteps}")
print("\n top 20 (exclusive ms/step):")
for name, t in sorted(excl.items(), key=lambda kv: -kv[1])[:20]:
    m = re.search(r"%(\S+?) =", name)
    short = m.group(1) if m else name[:50]
    m2 = re.search(r"=\s*\(?([a-z0-9]+\[[0-9,]*\])", name)
    print(f"  {t/1e9/nsteps:8.3f} ms x{cnt[name]//nsteps:4d}  {short:45s} {m2.group(1) if m2 else ''}")
