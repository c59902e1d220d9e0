"""Background: 10-seed avg/single protocols on cora+citeseer (CPU)."""
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
from grandtpu.config import preset
from grandtpu.train import train

results = {}
for ds in ("cora", "citeseer"):
    for mode in ("avg", "single"):
        cfg = preset(ds, mode)
        accs = []
        for s2 in range(10):
            r = train(cfg.replace(seed2=s2))
            accs.append(r.test_acc)
            print(f"{ds}/{mode} seed2={s2} acc={r.test_acc:.4f}", flush=True)
        results[f"{ds}_{mode}"] = dict(mean=float(np.mean(accs)),
                                       std=float(np.std(accs)), n=len(accs))
        print(json.dumps({f"{ds}_{mode}": results[f"{ds}_{mode}"]}), flush=True)
with open("protocol_avg_single.json", "w") as f:
    json.dump(results, f, indent=1)
print("DONE", flush=True)
