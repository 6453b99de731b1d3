#!/usr/bin/env python
"""Delete all non-latest checkpoints in a work dir tree
(/root/reference/tools/checkpoint_cleaner.py equivalent)."""
import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--work-dir', default='work_dirs')
    parser.add_argument('--dry-run', action='store_true')
    args = parser.parse_args()

    for root, dirs, files in os.walk(args.work_dir):
        ckpts = [f for f in files
                 if f.startswith('iter_') and f.endswith('.ckpt')]
        if len(ckpts) <= 1:
            continue
        ckpts.sort(key=lambda f: int(f[5:-5]))
        for f in ckpts[:-1]:
            path = os.path.join(root, f)
            print('rm', path)
            if not args.dry_run:
                os.remove(path)


if __name__ == '__main__':
    main()
