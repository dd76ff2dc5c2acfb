import io, os, sys, time
os.environ["KAPTIVE_PROFILE"] = "1"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
import bench
from kaptive_tpu.core.genome import GenomeAssembly
from kaptive_tpu.serotyping import Serotyper
from kaptive_tpu.utils.profiling import phase_report, reset_phases

db, assemblies = bench.build_fixtures()
ser = Serotyper(db)
mk = lambda n, c: GenomeAssembly.from_stream(io.BytesIO(b">c1\n%s\n" % c), n)
warm = [mk(f"w{i}", assemblies[i][2]) for i in range(8)]
ser.batch(warm)  # compile
reset_phases()
t0 = time.perf_counter()
for s in range(0, 16, 8):
    ser.batch([mk(f"a{i}", assemblies[i][2]) for i in range(s, s+8)])
print(f"steady: {16/(time.perf_counter()-t0):.2f} asm/s", file=sys.stderr)
phase_report()
