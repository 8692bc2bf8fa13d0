"""Quick tunnel health probe (reuses bench.py's probe)."""
import sys
sys.path.insert(0, "/root/repo")
from bench import probe_tunnel
m, l = probe_tunnel()
print(f"matmul_ms={m:.2f} link_mbps={l:.1f}")
