"""Library-level DataFrame→DataFrame functions (SURVEY.md §4.2: no custom
Catalyst rules — everything here composes built-in expressions so Catalyst
and whole-stage codegen see straight through it)."""
