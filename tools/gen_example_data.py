"""Generate the bundled example dataset pair (ml-1m -> ml-100k style).

The upstream mirror strips the .inter blobs, so we synthesize a structurally
equivalent pair: user tokens are domain-prefixed (``1m_*`` / ``100k_*``, so
zero user overlap) while item tokens are shared movie-title strings (item
overlap) — matching the real pair's shape (SURVEY §2 component 14).

Deterministic: fixed numpy seed. Run from repo root:
    python tools/gen_example_data.py
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "recbole_cdr_tpu", "dataset_example")

N_ITEMS_SHARED = 120
N_ITEMS_1M_ONLY = 80
N_ITEMS_100K_ONLY = 60


def gen_domain(rng, name, user_prefix, n_users, items, min_inter, max_inter,
               item_factors, user_factors):
    """Preference-structured interactions: a user's choice and rating follow
    a latent dot-product, so models have real signal to learn (and learning
    sanity checks can assert above-random ranking quality)."""
    rows = []
    for u in range(1, n_users + 1):
        uid = f"{user_prefix}_{u}"
        n = rng.integers(min_inter, max_inter + 1)
        affinity = item_factors @ user_factors[u - 1]
        p = np.exp(affinity - affinity.max())
        p /= p.sum()
        chosen = rng.choice(len(items), size=min(n, len(items)), replace=False, p=p)
        for c in chosen:
            # rating increases with affinity + noise
            score = affinity[c] + rng.normal(0, 1.0)
            rating = int(np.clip(np.round(3 + score), 1, 5))
            ts = int(8.8e8 + rng.integers(0, 1e7))
            rows.append((uid, items[c], rating, ts))
    os.makedirs(os.path.join(OUT, name), exist_ok=True)
    with open(os.path.join(OUT, name, f"{name}.inter"), "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        for uid, iid, r, ts in rows:
            f.write(f"{uid}\t{iid}\t{r}\t{ts}\n")
    with open(os.path.join(OUT, name, f"{name}.user"), "w") as f:
        f.write("user_id:token\tage:token\n")
        for u in range(1, n_users + 1):
            f.write(f"{user_prefix}_{u}\t{int(rng.integers(18, 60))}\n")
    print(f"{name}: {len(rows)} interactions, {n_users} users, {len(items)} items")


def main():
    rng = np.random.default_rng(42)
    shared = [f"Movie {i:03d} (199{i % 10})" for i in range(N_ITEMS_SHARED)]
    only_1m = [f"Film A{i:03d} (200{i % 10})" for i in range(N_ITEMS_1M_ONLY)]
    only_100k = [f"Film B{i:03d} (198{i % 10})" for i in range(N_ITEMS_100K_ONLY)]

    K = 4  # latent dim of the generating process
    shared_f = rng.normal(0, 1, (N_ITEMS_SHARED, K))
    f_1m = np.concatenate([shared_f, rng.normal(0, 1, (N_ITEMS_1M_ONLY, K))])
    f_100k = np.concatenate([shared_f, rng.normal(0, 1, (N_ITEMS_100K_ONLY, K))])
    users_1m = rng.normal(0, 1, (220, K))
    users_100k = rng.normal(0, 1, (130, K))

    gen_domain(rng, "ml-1m", "1m", 220, shared + only_1m, 18, 40, f_1m, users_1m)
    gen_domain(rng, "ml-100k", "100k", 130, shared + only_100k, 15, 35, f_100k, users_100k)


if __name__ == "__main__":
    main()
