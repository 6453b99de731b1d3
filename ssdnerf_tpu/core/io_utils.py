"""IO utilities.

Equivalent of /root/reference/lib/core/utils/io_utils.py: rank-0 download
with a cross-process barrier (the reference uses torch.distributed barrier;
here a filesystem sentinel + jax.process_index covers TPU pods).
"""
import os
import time
import urllib.request


def download_from_url(url, dest_path, rank=None, timeout=600):
    """Download ``url`` to ``dest_path`` on rank 0; other ranks wait."""
    import jax
    rank = jax.process_index() if rank is None else rank
    if os.path.exists(dest_path):
        return dest_path
    sentinel = dest_path + '.done'
    if rank == 0:
        os.makedirs(os.path.dirname(dest_path) or '.', exist_ok=True)
        tmp = dest_path + '.tmp'
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dest_path)
        with open(sentinel, 'w') as f:
            f.write('ok')
    else:
        t0 = time.time()
        while not os.path.exists(sentinel):
            if time.time() - t0 > timeout:
                raise TimeoutError(f'waiting for {dest_path}')
            time.sleep(1)
    return dest_path
