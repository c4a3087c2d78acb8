"""Ray-Data-native spatial + training-data engine (see SURVEY.md)."""
