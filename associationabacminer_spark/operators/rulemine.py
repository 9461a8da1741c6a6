"""Frequent-itemset rule mining + policy scoring — the reference's core
query (SURVEY.md §2.6/2.7), re-expressed Spark-first.

Pipeline parity map:
- one-hot + FP-growth (/root/reference/src/EnvAbacRuleMiner.py:161-168)
  -> ``pyspark.ml.fpm.FPGrowth`` over 'k=v' item baskets (no OHE needed)
- top-k itemset pruning (EnvAbacRuleMiner.py:234-247) -> orderBy/limit
- candidate scoring by batched count queries
  (/root/reference/src/eval/EnvOverassignmentCalculator.py:59-201)
  -> ONE conditional-aggregation pass over the (event x candidate)
  match join — no per-candidate round trips
- greedy cover loop with deletion (EnvAbacRuleMiner.py:133-232,268-272)
  -> driver loop: filter-out covered rows + localCheckpoint per
  iteration (cuts lineage, the delete_by_query(refresh=True) analog)
- policy confusion matrix (/root/reference/src/eval/EnvPolicyEvaluator.py:202-252)
  with the positives count either FACTORIZED (|U|*|O|*|E|, the O6
  rewrite at EnvOverassignmentCalculator.py:113-116) or estimated by
  the from-scratch HLL sketch — replacing the reference's brute-force
  Cartesian enumeration into a hash set (EnvPolicyEvaluator.py:106-169).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from associationabacminer_spark.functions.normalize import constraint_predicate


@dataclass
class Rule:
    constraints: dict[str, str]  # key -> value (single-valued per mining round)
    support: int = 0
    score: float = 0.0
    metrics: dict = field(default_factory=dict)

    def predicate(self):
        return constraint_predicate(
            {
                k: (list(v) if isinstance(v, (list, set, tuple)) else [v])
                for k, v in self.constraints.items()
            }
        )


@dataclass
class Policy:
    rules: list[Rule] = field(default_factory=list)

    def allows(self):
        """Disjunction of rule predicates (policy_allows_event,
        /root/reference/src/eval/EnvPolicyEvaluator.py:32-36)."""
        if not self.rules:
            return F.lit(False)
        pred = self.rules[0].predicate()
        for r in self.rules[1:]:
            pred = pred | r.predicate()
        return pred


def baskets(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows -> 'k=v' item baskets (replaces Orange one-hot encoding)."""
    items = F.array(
        *[F.concat_ws("=", F.lit(c), F.coalesce(F.col(c).cast("string"), F.lit("NONE"))) for c in cols]
    )
    return df.select(items.alias("items"))


def frequent_itemsets(
    df: DataFrame, cols: list[str], min_support: float = 0.1, itemset_limit: int = 10_000
) -> DataFrame:
    """Distributed FP-growth (the reference explores min_support
    0.05-0.3 with a 600k itemset cap, job_generator.py:114-115)."""
    from pyspark.ml.fpm import FPGrowth

    fp = FPGrowth(itemsCol="items", minSupport=min_support, minConfidence=0.5)
    model = fp.fit(baskets(df, cols))
    return model.freqItemsets.orderBy(F.desc("freq"), F.asc(F.col("items").cast("string"))).limit(
        itemset_limit
    )


def _itemset_to_rule(items: list[str], freq: int) -> Rule:
    constraints = {}
    for it in items:
        k, _, v = it.partition("=")
        constraints[k] = v
    return Rule(constraints=constraints, support=int(freq))


def score_candidates(
    uncovered: DataFrame,
    all_df: DataFrame,
    candidates: list[Rule],
    dims: dict[str, str] | None = None,
    beta: float = 1.0,
    metric: str = "c_score",
) -> list[Rule]:
    """Score every candidate in ONE aggregation pass: build a boolean
    match column per rule, then conditional sums.  Replaces the
    reference's 5-query-per-rule / 400-per-msearch batches
    (/root/reference/src/eval/EnvOverassignmentCalculator.py:59-106,
    186-198) with a single job.

    Metric suite mirrors process_separated_buffered_results
    (EnvOverassignmentCalculator.py:108-166):
    - coverage  = covered / uncovered-total (the Qrul_freq family)
    - overassignment rate ~ covered / |allowed universe of the rule|,
      where |allowed| is FACTORIZED as the product of per-dimension
      distinct counts under the rule (the O6 rewrite at lines 113-116)
    - c_score   = (1+beta^2) * cov * oa / (beta^2 * oa + cov)
      (beta-weighted harmonic mean, the paper's C-Score)
    - product   = cov * oa
    - l_dist    = sqrt((1-cov)^2 + (1-oa)^2)  (minimized)
    - wsc penalty via constraint count (WscCalculator.py:24-53)
    ``dims`` maps dimension name -> column for the factorized counts
    (defaults to the constraint keys themselves)."""
    aggs = []
    for i, r in enumerate(candidates):
        pred = r.predicate()
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(f"c{i}"))
        for dname, dcol in (dims or {}).items():
            aggs.append(
                F.countDistinct(F.when(pred, F.col(dcol))).alias(f"d{i}_{dname}")
            )
    row = uncovered.agg(*aggs).collect()[0]
    n_uncovered = uncovered.count()
    for i, r in enumerate(candidates):
        covered = row[f"c{i}"] or 0
        cov = covered / max(1, n_uncovered)
        allowed = 1.0
        for dname in dims or {}:
            allowed *= max(1, row[f"d{i}_{dname}"] or 0)
        # without dimension info there is no universe estimate: treat the
        # rule as tight (oa=1) so the metric reduces to coverage
        oa = (covered / allowed) if dims else 1.0
        r.support = covered
        r.metrics = {
            "coverage": cov,
            "overassignment": oa,
            "c_score": (
                (1 + beta**2) * cov * oa / (beta**2 * oa + cov)
                if (cov + oa) > 0
                else 0.0
            ),
            "product": cov * oa,
            "l_dist": ((1 - cov) ** 2 + (1 - oa) ** 2) ** 0.5,
            "wsc": float(len(r.constraints)),
        }
        if metric == "l_dist":
            r.score = -r.metrics["l_dist"]  # minimized in the reference
        elif metric in r.metrics:
            r.score = r.metrics[metric]
        else:
            r.score = cov - 0.001 * len(r.constraints)
        # M6 validity check (EnvOverassignmentCalculator.py:130-136)
        if covered == 0:
            r.score = float("-inf")
    return candidates


def mine_rules(
    df: DataFrame,
    cols: list[str],
    min_support: float = 0.1,
    max_rules: int = 20,
    candidate_limit: int = 50,
) -> Policy:
    """Greedy set-cover mining loop (mine_rules_for_window,
    /root/reference/src/EnvAbacRuleMiner.py:133-232)."""
    uncovered = df.select(*cols).localCheckpoint()
    policy = Policy()
    while len(policy.rules) < max_rules:
        remaining = uncovered.count()
        if remaining <= 1:
            break
        freq = frequent_itemsets(
            uncovered, cols, min_support=min_support, itemset_limit=candidate_limit
        ).collect()
        if not freq:
            break
        candidates = [_itemset_to_rule(r["items"], r["freq"]) for r in freq]
        candidates = score_candidates(uncovered, df, candidates)
        best = max(
            candidates, key=lambda r: (r.score, -len(r.constraints))
        )  # argmax w/ fewer-constraints tiebreak (EnvAbacRuleMiner.py:107-122)
        if best.support == 0:
            break
        policy.rules.append(best)
        # anti-join by deletion (EnvAbacRuleMiner.py:268-272) + eager
        # materialization between iterations (delete refresh=True analog)
        uncovered = uncovered.filter(~best.predicate()).localCheckpoint()
    return policy


def merge_rules(policy: Policy) -> Policy:
    """Pairwise rule merge to fixpoint (T6,
    /root/reference/src/eval/RuleMerger.py:19-64): rules whose constraint
    maps agree on all but one key collapse into one rule whose differing
    key takes the union of values.  Driver-side (rules are few)."""
    rules = [dict((k, {v} if isinstance(v, str) else set(v)) for k, v in r.constraints.items()) for r in policy.rules]
    changed = True
    while changed:
        changed = False
        for i in range(len(rules)):
            if changed:
                break
            for j in range(i + 1, len(rules)):
                a, b = rules[i], rules[j]
                if set(a) != set(b):
                    continue
                diff = [k for k in a if a[k] != b[k]]
                if len(diff) <= 1:
                    if diff:
                        a[diff[0]] = a[diff[0]] | b[diff[0]]
                    rules.pop(j)
                    changed = True
                    break
    out = Policy()
    for r in rules:
        out.rules.append(
            Rule(constraints={k: sorted(v) if len(v) > 1 else next(iter(v)) for k, v in r.items()})
        )
    return out


def wsc(policy: Policy, weights: dict[str, float] | None = None) -> float:
    """Weighted structural complexity (M4,
    /root/reference/src/eval/WscCalculator.py:24-53): weighted count of
    constraints per class of key."""
    weights = weights or {}
    total = 0.0
    for r in policy.rules:
        for k, v in r.constraints.items():
            n_vals = len(v) if isinstance(v, (list, set, tuple)) else 1
            total += weights.get(k, 1.0) * n_vals
    return total


def auc_from_points(fpr: list[float], tpr: list[float]) -> float:
    """Trapezoidal ROC AUC over (FPR, TPR) points (M5,
    /root/reference/src/job/AUCPrinter.py:22-37 — sklearn.metrics.auc
    replaced by a dependency-free trapezoid on the tiny aggregate)."""
    pts = sorted(zip(fpr, tpr))
    area = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        area += (x1 - x0) * (y0 + y1) / 2.0
    return area


def score_policy(
    policy: Policy,
    opr_df: DataFrame,
    universe_counts: dict[str, int] | None = None,
    positives_estimate: float | None = None,
) -> dict[str, float]:
    """Confusion matrix on the operation window
    (/root/reference/src/eval/EnvPolicyEvaluator.py:202-252).

    positives (|allowed universe|) comes from either the factorized
    product of per-dimension counts (``universe_counts``) or an HLL
    estimate (``positives_estimate``) — never brute-force enumeration.
    Divide-by-zero rates are redefined to 1.0 exactly as the reference
    does (EnvPolicyEvaluator.py:225-248)."""
    allowed = policy.allows()
    row = opr_df.agg(
        F.sum(F.when(allowed, 1).otherwise(0)).alias("tp"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, n = int(row["tp"] or 0), int(row["n"])
    fn = n - tp
    if positives_estimate is not None:
        positives = float(positives_estimate)
    elif universe_counts:
        positives = 1.0
        for c in universe_counts.values():
            positives *= c
    else:
        positives = float(tp)
    fp = max(0.0, positives - tp)
    total_universe = max(positives, float(n))
    tn = max(0.0, total_universe - tp - fn - fp)
    precision = tp / (tp + fp) if (tp + fp) > 0 else 1.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 1.0
    specificity = tn / (tn + fp) if (tn + fp) > 0 else 1.0
    accuracy = (
        (tp + tn) / (tp + tn + fp + fn) if (tp + tn + fp + fn) > 0 else 1.0
    )
    fpr = fp / (fp + tn) if (fp + tn) > 0 else 0.0
    return {
        "tp": float(tp),
        "fn": float(fn),
        "fp": fp,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "specificity": specificity,
        "accuracy": accuracy,
        "fpr": fpr,
        "n_rules": float(len(policy.rules)),
        "wsc": float(sum(len(r.constraints) for r in policy.rules)),
    }
