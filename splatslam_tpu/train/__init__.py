from .droid_trainer import train, make_train_step, load_selftrained  # noqa: F401
