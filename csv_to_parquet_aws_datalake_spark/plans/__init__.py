"""Physical-plan assertions (pushdown / broadcast / codegen) used in tests."""
