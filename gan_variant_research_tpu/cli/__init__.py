"""CLI entry points keeping the reference's flag surface:
train_cutpp, train_cyclegan, generate_folder, eval (evalsuite.cli)."""
