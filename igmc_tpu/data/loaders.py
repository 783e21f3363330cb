"""Raw MovieLens dataset loaders with auto-download and contiguous ID remap.

Capability parity with the reference loaders (/root/reference/data_utils.py:42-380):
  * `map_data`   — remap arbitrary ids to a contiguous [0, N) range (sorted order).
  * `download_dataset` — fetch a MovieLens archive from grouplens if missing.
  * `load_data`  — parse ratings + side features for ml_100k / ml_1m / ml_10m /
    ml_25m, applying the CF-NADE-style `random.shuffle` with a fixed seed so
    splits are reproducible and comparable to the reference.

The raw data directory is resolved by `raw_data_dir()`: the `IGMC_RAW_DATA`
environment variable if set, else `./raw_data`. The bundled Monti `.mat`
files shipped with the reference can be used by pointing `IGMC_RAW_DATA`
at a directory containing `flixster/ douban/ yahoo_music/` subdirs.
"""

from __future__ import annotations

import os
import random
import numpy as np
import scipy.sparse as sp


# Rows per streamed chunk of the ml_25m CSV read (patchable in tests to
# force the multi-chunk path on small fixtures).
ML25M_CHUNK_ROWS = 1_000_000


def raw_data_dir(dataset: str = None) -> str:
    """Directory holding raw dataset folders (flixster/, ml_100k/, ...).

    Resolution is PER DATASET when a name is given: a local `raw_data/`
    that was created for one dataset (e.g. a MovieLens split pickle cache)
    must not hide the read-only reference bundles of the others."""
    d = os.environ.get("IGMC_RAW_DATA")
    if d:
        return d
    local = os.path.join(os.getcwd(), "raw_data")
    ref = "/root/reference/raw_data"
    if dataset is not None:
        if os.path.isdir(os.path.join(local, dataset)):
            return local
        if os.path.isdir(os.path.join(ref, dataset)):
            return ref
        return local
    # Fall back to the read-only reference bundle if present and no local copy.
    if not os.path.isdir(local) and os.path.isdir(ref):
        return ref
    return local


def map_data(data):
    """Remap ids to contiguous [0, N) by sorted original id.

    Returns (mapped_array, id_dict, n). Same semantics as the reference's
    dict-comprehension loop (/root/reference/data_utils.py:28-38) — the new id
    is the rank of the old id in sorted-unique order — but vectorized with
    np.unique so the 25M-row ml_25m remap takes seconds, not minutes.
    """
    uniq, inv = np.unique(np.asarray(data), return_inverse=True)
    id_dict = {old: new for new, old in enumerate(uniq.tolist())}
    return inv.astype(np.int64), id_dict, len(uniq)


def download_dataset(dataset: str, files, data_dir: str) -> None:
    """Download a MovieLens dataset from grouplens if any file is missing.

    No-op when all files exist. Raises a clear error when the environment
    has no network egress.
    """
    if np.all([os.path.isfile(data_dir + f) for f in files]):
        return
    from io import BytesIO
    from urllib.request import urlopen
    from zipfile import ZipFile

    url = (
        "http://files.grouplens.org/datasets/movielens/"
        + dataset.replace("_", "-")
        + ".zip"
    )
    if dataset in ("ml_100k", "ml_1m"):
        target_dir = os.path.join(os.path.dirname(data_dir), dataset.replace("_", "-"))
    elif dataset == "ml_10m":
        target_dir = os.path.join(os.path.dirname(data_dir), "ml-10M100K")
    else:
        raise ValueError(f"Invalid dataset option {dataset}")

    print(f"Downloading {dataset} dataset from {url}")
    try:
        request = urlopen(url)
        with ZipFile(BytesIO(request.read())) as zip_ref:
            zip_ref.extractall(os.path.dirname(data_dir) or ".")
        os.rename(target_dir, data_dir)
    except OSError as e:  # no egress / DNS failure
        raise RuntimeError(
            f"Cannot download {dataset} ({e}). Place the extracted files under "
            f"{data_dir} manually, or set IGMC_RAW_DATA to a directory that "
            f"contains them."
        ) from e


def _cf_nade_shuffle(data_array_list, seed):
    """Shuffle a list-of-rows with Python's random, as in CF-NADE.

    The reference shuffles the *list* (not ndarray) with `random.shuffle`
    seeded by the data seed so that splits are bit-reproducible
    (/root/reference/data_utils.py:152-157).
    """
    random.seed(seed)
    random.shuffle(data_array_list)
    return np.array(data_array_list)


def _movie_genre_features_100k(data_dir, v_dict, num_items):
    import pandas as pd

    movie_headers = [
        "movie id", "movie title", "release date", "video release date",
        "IMDb URL", "unknown", "Action", "Adventure", "Animation",
        "Childrens", "Comedy", "Crime", "Documentary", "Drama", "Fantasy",
        "Film-Noir", "Horror", "Musical", "Mystery", "Romance", "Sci-Fi",
        "Thriller", "War", "Western",
    ]
    movie_df = pd.read_csv(
        data_dir + "/u.item", sep=r"|", header=None, names=movie_headers,
        engine="python", encoding="latin-1",
    )
    genre_headers = movie_df.columns.values[6:]
    v_features = np.zeros((num_items, genre_headers.shape[0]), dtype=np.float32)
    for movie_id, g_vec in zip(
        movie_df["movie id"].values.tolist(), movie_df[genre_headers].values.tolist()
    ):
        if movie_id in v_dict:
            v_features[v_dict[movie_id], :] = g_vec
    return v_features


def _user_features_100k(data_dir, u_dict, num_users, normalize_age=False):
    import pandas as pd

    users_headers = ["user id", "age", "gender", "occupation", "zip code"]
    users_df = pd.read_csv(
        data_dir + "/u.user", sep=r"|", header=None, names=users_headers,
        engine="python", encoding="latin-1",
    )
    # sorted: set iteration order depends on PYTHONHASHSEED and would make
    # the one-hot column layout differ between processes
    occupation = sorted(set(users_df["occupation"].values.tolist()))
    gender_dict = {"M": 0.0, "F": 1.0}
    occupation_dict = {f: i for i, f in enumerate(occupation, start=2)}
    num_feats = 2 + len(occupation_dict)
    age_max = users_df["age"].values.max() if normalize_age else 1.0
    u_features = np.zeros((num_users, num_feats), dtype=np.float32)
    for _, row in users_df.iterrows():
        u_id = row["user id"]
        if u_id in u_dict:
            u_features[u_dict[u_id], 0] = row["age"] / float(age_max)
            u_features[u_dict[u_id], 1] = gender_dict[row["gender"]]
            u_features[u_dict[u_id], occupation_dict[row["occupation"]]] = 1.0
    return u_features


def _movie_genre_features_1m(data_dir, v_dict, num_items, sep=r"\:\:"):
    import pandas as pd

    movies_df = pd.read_csv(
        data_dir + "/movies.dat", sep=sep, header=None,
        names=["movie_id", "title", "genre"], engine="python", encoding="latin-1",
    )
    genres = []
    for s in movies_df["genre"].values:
        genres.extend(s.split("|"))
    genres = sorted(set(genres))  # deterministic column order
    genres_dict = {g: idx for idx, g in enumerate(genres)}
    v_features = np.zeros((num_items, len(genres)), dtype=np.float32)
    for movie_id, s in zip(
        movies_df["movie_id"].values.tolist(), movies_df["genre"].values.tolist()
    ):
        if movie_id in v_dict:
            for g in s.split("|"):
                v_features[v_dict[movie_id], genres_dict[g]] = 1.0
    return v_features


def _user_features_1m(data_dir, u_dict, num_users, sep=r"\:\:"):
    import pandas as pd

    users_df = pd.read_csv(
        data_dir + "/users.dat", sep=sep, header=None,
        names=["user_id", "gender", "age", "occupation", "zip-code"],
        engine="python", encoding="latin-1",
    )
    cols = users_df.columns.values[1:]
    cntr = 0
    feat_dicts = []
    for header in cols:
        feats = np.unique(users_df[header].values).tolist()
        d = {f: i for i, f in enumerate(feats, start=cntr)}
        feat_dicts.append(d)
        cntr += len(d)
    num_feats = sum(len(d) for d in feat_dicts)
    u_features = np.zeros((num_users, num_feats), dtype=np.float32)
    for _, row in users_df.iterrows():
        u_id = row["user_id"]
        if u_id in u_dict:
            for k, header in enumerate(cols):
                u_features[u_dict[u_id], feat_dicts[k][row[header]]] = 1.0
    return u_features


def load_data(fname: str, seed: int = 1234, verbose: bool = True):
    """Load a MovieLens dataset; returns
    (num_users, num_items, u_nodes, v_nodes, ratings, u_features, v_features).

    Mirrors the behavior of the reference loader
    (/root/reference/data_utils.py:88-380) including the CF-NADE shuffle.
    """
    import pandas as pd

    u_features = None
    v_features = None
    data_dir = os.path.join(raw_data_dir(fname), fname)

    if fname == "ml_100k":
        download_dataset(fname, ["/u.data", "/u.item", "/u.user"], data_dir)
        dtypes = {
            "u_nodes": np.int32, "v_nodes": np.int32,
            "ratings": np.float32, "timestamp": np.float64,
        }
        data = pd.read_csv(
            data_dir + "/u.data", sep="\t", header=None,
            names=["u_nodes", "v_nodes", "ratings", "timestamp"], dtype=dtypes,
        )
        data_array = _cf_nade_shuffle(data.values.tolist(), seed)
        u_nodes_ratings = data_array[:, 0].astype(dtypes["u_nodes"])
        v_nodes_ratings = data_array[:, 1].astype(dtypes["v_nodes"])
        ratings = data_array[:, 2].astype(dtypes["ratings"])
        u_nodes_ratings, u_dict, num_users = map_data(u_nodes_ratings)
        v_nodes_ratings, v_dict, num_items = map_data(v_nodes_ratings)
        u_nodes_ratings = u_nodes_ratings.astype(np.int64)
        v_nodes_ratings = v_nodes_ratings.astype(np.int32)
        ratings = ratings.astype(np.float64)
        v_features = sp.csr_matrix(
            _movie_genre_features_100k(data_dir, v_dict, num_items)
        )
        u_features = sp.csr_matrix(
            _user_features_100k(data_dir, u_dict, num_users, normalize_age=False)
        )

    elif fname == "ml_1m":
        download_dataset(fname, ["/ratings.dat", "/movies.dat", "/users.dat"], data_dir)
        sep = r"\:\:"
        dtypes = {
            "u_nodes": np.int64, "v_nodes": np.int64,
            "ratings": np.float32, "timestamp": np.float64,
        }
        data = pd.read_csv(
            data_dir + "/ratings.dat", sep=sep, header=None,
            names=["u_nodes", "v_nodes", "ratings", "timestamp"],
            converters=dtypes, engine="python",
        )
        data_array = _cf_nade_shuffle(data.values.tolist(), seed)
        u_nodes_ratings = data_array[:, 0].astype(dtypes["u_nodes"])
        v_nodes_ratings = data_array[:, 1].astype(dtypes["v_nodes"])
        ratings = data_array[:, 2].astype(dtypes["ratings"])
        u_nodes_ratings, u_dict, num_users = map_data(u_nodes_ratings)
        v_nodes_ratings, v_dict, num_items = map_data(v_nodes_ratings)
        u_nodes_ratings = u_nodes_ratings.astype(np.int64)
        v_nodes_ratings = v_nodes_ratings.astype(np.int64)
        ratings = ratings.astype(np.float32)
        v_features = sp.csr_matrix(
            _movie_genre_features_1m(data_dir, v_dict, num_items, sep)
        )
        u_features = sp.csr_matrix(_user_features_1m(data_dir, u_dict, num_users, sep))

    elif fname == "ml_10m":
        download_dataset(fname, ["/ratings.dat"], data_dir)
        sep = r"\:\:"
        dtypes = {
            "u_nodes": np.int64, "v_nodes": np.int64,
            "ratings": np.float32, "timestamp": np.float64,
        }
        data = pd.read_csv(
            data_dir + "/ratings.dat", sep=sep, header=None,
            names=["u_nodes", "v_nodes", "ratings", "timestamp"],
            converters=dtypes, engine="python",
        )
        data_array = _cf_nade_shuffle(data.values.tolist(), seed)
        u_nodes_ratings = data_array[:, 0].astype(dtypes["u_nodes"])
        v_nodes_ratings = data_array[:, 1].astype(dtypes["v_nodes"])
        ratings = data_array[:, 2].astype(dtypes["ratings"])
        u_nodes_ratings, u_dict, num_users = map_data(u_nodes_ratings)
        v_nodes_ratings, v_dict, num_items = map_data(v_nodes_ratings)
        u_nodes_ratings = u_nodes_ratings.astype(np.int64)
        v_nodes_ratings = v_nodes_ratings.astype(np.int64)
        ratings = ratings.astype(np.float32)

    elif fname == "ml_25m":
        # Pre-processed movielens25M.csv: uid,iid,cid,time,rating sorted by time.
        # Streamed in bounded chunks (the reference also chunks the read,
        # /root/reference/data_utils.py:343-357, but concatenates into one
        # object DataFrame before .values — several GB of transient host RAM
        # at 25M rows). Here each chunk is narrowed to typed numpy columns
        # immediately, so peak memory is ~the final arrays plus one chunk.
        u_parts, v_parts, r_parts = [], [], []
        for chunk in pd.read_csv(
            data_dir + "/movielens25M.csv", header=0,
            usecols=["uid", "iid", "rating"],
            dtype={"uid": np.int64, "iid": np.int64, "rating": np.float32},
            chunksize=ML25M_CHUNK_ROWS,
        ):
            u_parts.append(chunk["uid"].to_numpy())
            v_parts.append(chunk["iid"].to_numpy())
            r_parts.append(chunk["rating"].to_numpy())
        u_nodes_ratings, u_dict, num_users = map_data(np.concatenate(u_parts))
        v_nodes_ratings, v_dict, num_items = map_data(np.concatenate(v_parts))
        del u_parts, v_parts
        ratings = np.concatenate(r_parts).astype(np.float32)

    else:
        raise ValueError("Dataset name not recognized: " + fname)

    if verbose:
        print("Number of users = %d" % num_users)
        print("Number of items = %d" % num_items)
        print("Number of links = %d" % ratings.shape[0])
        print(
            "Fraction of positive links = %.4f"
            % (float(ratings.shape[0]) / (num_users * num_items),)
        )

    return num_users, num_items, u_nodes_ratings, v_nodes_ratings, ratings, u_features, v_features
