from shud_tpu.io.tables import read_table, read_tables
from shud_tpu.io.project import FilePaths, ProjectInput, load_project
