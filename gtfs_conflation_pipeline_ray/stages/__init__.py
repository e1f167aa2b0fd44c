"""Stage library: each public function is ``Dataset -> Dataset`` (or takes a
broadcast small-side ref) and maps to a row of SURVEY.md §2's operator
inventory. Stages never call ``ray.init``."""
