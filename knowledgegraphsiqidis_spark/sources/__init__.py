"""Sources and sinks: transcript synthesis, testdata loaders, graph table writers."""
