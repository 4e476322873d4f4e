"""BrainSpan workload (tests/brainspan.R:12-29): 2 confounders, no
interaction, K=25, lambda=6, alpha=0.4, partition=0, global_tol=1e-10."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import parse_args, load_or_simulate, save_fitted
import insider_tpu as it

args = parse_args("brainspan")
data, conf = load_or_simulate(args, n_rows=500, level_counts=(16, 26),
                              latent_dim=25, confounder_cols=2)
obj = it.Insider(data, conf, global_tol=1e-10,
                 max_iter=args.max_iter or 50000)
obj = obj.fit(25, lambda_=6, alpha=0.4, partition=0)
save_fitted(obj, args.out or "insider_brainspan_R25_fitted_object.npz")
