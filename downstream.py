#!/usr/bin/env python
"""Downstream classification eval (reference downstream.py:26-152):

    python downstream.py <output_dir> [-e epoch | -ei interval] [-c lr svm ...]

Per generator checkpoint: generate 10k labeled MNIST samples, train sklearn
OneVsRest classifiers on them, report micro-AUROC against the real MNIST
test set, append to <output_dir>/downstream_log.csv.

Reference bugs fixed (do-not-copy list, SURVEY.md §7): the chosen classifier
is actually used (downstream.py:139 always passed "lr"), and the classifier
imports exist (downstream.py:4-9 vs 67-82).
"""

import argparse
import csv
import os
from pathlib import Path

import jax
import numpy as np
from sklearn.ensemble import AdaBoostClassifier, RandomForestClassifier
from sklearn.exceptions import ConvergenceWarning
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import auc, roc_curve
from sklearn.multiclass import OneVsRestClassifier
from sklearn.naive_bayes import BernoulliNB, GaussianNB
from sklearn.neural_network import MLPClassifier
from sklearn.preprocessing import label_binarize
from sklearn.svm import SVC
from sklearn.tree import DecisionTreeClassifier
from sklearn.utils._testing import ignore_warnings

from csl_gan_tpu import options
from csl_gan_tpu.data import mnist as mnist_mod
from csl_gan_tpu.models.registry import init_models
from csl_gan_tpu.training import checkpoint
from csl_gan_tpu.training.steps import TrainStepBuilder

CLASSIFIERS = ["svm", "dt", "lr", "rf", "gnb", "bnb", "ab", "mlp"]


def compute_fpr_tpr_roc(Y_test, Y_score):
    n_classes = Y_score.shape[1]
    fpr, tpr, roc_auc = {}, {}, {}
    for c in range(n_classes):
        fpr[c], tpr[c], _ = roc_curve(Y_test[:, c], Y_score[:, c])
        roc_auc[c] = auc(fpr[c], tpr[c])
    fpr["micro"], tpr["micro"], _ = roc_curve(Y_test.ravel(), Y_score.ravel())
    roc_auc["micro"] = auc(fpr["micro"], tpr["micro"])
    return fpr, tpr, roc_auc


@ignore_warnings(category=ConvergenceWarning)
def classify(X_train, Y_train, X_test, name, random_state_value=0):
    makers = {
        "svm": lambda: SVC(kernel="linear", probability=True,
                           random_state=random_state_value),
        "dt": lambda: DecisionTreeClassifier(random_state=random_state_value),
        "lr": lambda: LogisticRegression(solver="lbfgs",
                                         random_state=random_state_value),
        "rf": lambda: RandomForestClassifier(n_estimators=100,
                                             random_state=random_state_value),
        "gnb": lambda: GaussianNB(),
        "bnb": lambda: BernoulliNB(alpha=0.01),
        "ab": lambda: AdaBoostClassifier(random_state=random_state_value),
        "mlp": lambda: MLPClassifier(random_state=random_state_value, alpha=1),
    }
    classifier = OneVsRestClassifier(makers[name]())
    return classifier.fit(X_train, Y_train).predict_proba(X_test)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("-e", "--epochs", type=int, default=None)
    parser.add_argument("-ei", "--epoch_interval", type=int, default=100)
    parser.add_argument("-bs", "--batch_size", type=int, default=50)
    parser.add_argument("-d", "--device", type=str, default=None,
                        help="JAX platform override (cpu/tpu); the reference's CUDA-device flag mapped to the TPU-native notion. Defaults to the run's saved --platform.")
    parser.add_argument("-c", "--classifiers", type=str, default=["lr"],
                        nargs="*", choices=CLASSIFIERS)
    parser.add_argument("-n", "--num_samples", type=int, default=10000)
    args = parser.parse_args(argv)

    path = options.add_slash(args.path)
    train_opt = options.load_opt(path + "opt.txt")
    if args.device:
        train_opt.platform = args.device
    options.apply_platform(train_opt)
    if train_opt.dataset != "MNIST":
        raise Exception("Downstream evaluation only implemented for MNIST.")

    # abstract: each checkpoint load below replaces every leaf.
    (G, G_vars), (D, D_vars) = init_models(train_opt, abstract=True)
    builder = TrainStepBuilder(train_opt, G, D)
    base_state = builder.init_state(G_vars, D_vars)

    n = args.num_samples
    key = jax.random.PRNGKey(30)
    kz, ky = jax.random.split(key)
    z = builder.gen_z(kz, n)
    y = np.asarray(jax.random.randint(ky, (n,), 0, 10))

    X_test, Y_test_raw = mnist_mod.load_mnist(train_opt.data_path, train=False)
    X_test = X_test.reshape(X_test.shape[0], -1).astype(float)
    classes = list(range(10))
    Y_test = label_binarize([int(t) for t in Y_test_raw], classes=classes)

    log = open(path + "downstream_log.csv", "a")
    logger = csv.writer(log)
    logger.writerow(["Epoch"] + [c + " AUROC" for c in args.classifiers])
    log.flush()

    epoch = args.epoch_interval if args.epochs is None else args.epochs
    while True:
        gpath = path + "saves/G-" + str(epoch)
        if not Path(gpath).is_file():
            break
        state, _ = checkpoint.load_g(gpath, base_state)

        images = []
        # Phase cache once per checkpoint (serving-path --phase_carry
        # analog; params are fixed across the sampling batches).
        pcache = builder.phase_collapse(state.g_params)
        for i in range(0, n, args.batch_size):
            zi = z[i:i + args.batch_size]
            yi = (None if not train_opt.conditional
                  else np.asarray(y[i:i + args.batch_size]))
            img = builder.sample_images(
                state, zi, None if yi is None else jax.numpy.asarray(yi),
                pcache)
            images.append(np.asarray(jax.device_get(img)))
        images = np.concatenate(images).reshape(n, -1)

        aurocs = []
        for c in args.classifiers:
            Y_score = classify(images, y, X_test, c, random_state_value=30)
            _, _, roc_auc = compute_fpr_tpr_roc(Y_test, Y_score)
            print("{} AUROC ({}):  {}".format(c, epoch, roc_auc["micro"]))
            aurocs.append(roc_auc["micro"])
        logger.writerow([epoch] + aurocs)
        log.flush()

        if args.epochs is None:
            epoch += args.epoch_interval
        else:
            break
    log.close()


if __name__ == "__main__":
    main()
