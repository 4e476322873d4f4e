"""GTEx brain workload (tests/gtex.R:9-30): confounders (gender, structure)
+ interaction, K=12, lambda=60, alpha=0.5, global_tol=1e-10; the reference
runs 50 repeated tuning fits for stability — pass --repeats."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import parse_args, load_or_simulate, save_fitted
import insider_tpu as it

args = parse_args("gtex")
data, conf = load_or_simulate(args, n_rows=600, level_counts=(2, 13),
                              latent_dim=12, confounder_cols=2)
obj = it.Insider(data, conf, interaction_idx=[0, 1], global_tol=1e-10,
                 max_iter=args.max_iter or 1000)
# stability runs: rank tuning repeated with fresh seeds (tests/gtex.R:30)
for rep in range(int(os.environ.get("GTEX_REPEATS", "1"))):
    obj.seed = rep
    obj = obj.fit(12, lambda_=60, alpha=0.5, partition=1)
    print(f"repeat {rep}: test_rmse={obj.test_rmse}")
save_fitted(obj, args.out or "insider_gtex_R12_fitted_object.npz")
