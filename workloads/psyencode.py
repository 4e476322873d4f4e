"""PsychENCODE workload (tests/psyencode.R:11-27): 3 confounders, K=3,
lambda=120, alpha=0.9, partition=0, global_tol=1e-10."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import parse_args, load_or_simulate, save_fitted
import insider_tpu as it

args = parse_args("psyencode")
data, conf = load_or_simulate(args, n_rows=800, level_counts=(30, 2, 10),
                              latent_dim=3, confounder_cols=3)
obj = it.Insider(data, conf, global_tol=1e-10,
                 max_iter=args.max_iter or 50000)
obj = obj.fit(3, lambda_=120, alpha=0.9, partition=0)
save_fitted(obj, args.out or "insider_psyencode_R3_fitted_object.npz")
