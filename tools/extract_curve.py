"""Extract (step, env/rewards_mean) pairs from train logs into a curve file."""
import re
import sys

pat = re.compile(r"- (\d+)/\d+ .*?env/rewards_mean: ([0-9.e+-]+)")
rows = []
for path in sys.argv[1:]:
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m and float(m.group(2)) != 0.0:
                rows.append((int(m.group(1)), float(m.group(2))))
rows.sort()
for s, r in rows:
    print(s, r)
